# reference configs/_base_/runtime_10e.py (NCCL dist_params replaced by the
# jax.distributed/mesh launcher surface — tools/train.py)
checkpoint_config = dict(interval=10)
log_config = dict(interval=50)
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
