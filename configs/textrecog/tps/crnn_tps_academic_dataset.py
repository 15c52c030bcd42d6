# reference configs/textrecog/tps/crnn_tps_academic_dataset.py
_base_ = [
    '../../_base_/default_runtime.py',
    '../../_base_/schedules/schedule_adadelta_5e.py',
    '../../_base_/recog_models/crnn_tps.py',
    '../../_base_/recog_pipelines/crnn_pipeline.py',
    '../../_base_/recog_datasets/toy_data.py',
]
data = dict(
    samples_per_gpu=64,
    train=dict(type='UniformConcatDataset', datasets=['{{_base_.train}}'],
               pipeline='{{_base_.train_pipeline}}'),
    test=dict(type='UniformConcatDataset', datasets=['{{_base_.test}}'],
              pipeline='{{_base_.test_pipeline}}'))
test_pipeline = '{{_base_.test_pipeline}}'
input_shape = (32, 100, 1)
evaluation = dict(interval=1, metric='acc')
