# Flagship topology on the toy dataset (smoke/CI variant; the real recipe
# lives in nrtr_tps++.py wired to ST_MJ + academic_test_high).
_base_ = ['./nrtr_tps++.py', '../../_base_/recog_datasets/toy_data.py']

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=0,
    train=dict(type='UniformConcatDataset',
               datasets=['{{_base_.train}}'],
               pipeline='{{_base_.train_pipeline}}'),
    val=dict(type='UniformConcatDataset',
             datasets=['{{_base_.test}}'],
             pipeline='{{_base_.test_pipeline}}'),
    test=dict(type='UniformConcatDataset',
              datasets=['{{_base_.test}}'],
              pipeline='{{_base_.test_pipeline}}'))
