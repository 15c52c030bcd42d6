# runtime defaults (reference configs/_base_/default_runtime.py — NCCL
# dist_params replaced by the jax.distributed/mesh launcher surface)
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
input_shape = (32, 128, 3)
