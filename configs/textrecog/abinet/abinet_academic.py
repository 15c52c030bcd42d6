_base_ = [
    '../../_base_/default_runtime.py',
    '../../_base_/schedules/schedule_adam_step_6e.py',
    '../../_base_/recog_models/abinet.py',
    '../../_base_/recog_pipelines/abinet_pipeline.py',
    '../../_base_/recog_datasets/toy_data.py',
]
data = dict(
    samples_per_gpu=192,
    train=dict(type='UniformConcatDataset', datasets=['{{_base_.train}}'],
               pipeline='{{_base_.train_pipeline}}'),
    test=dict(type='UniformConcatDataset', datasets=['{{_base_.test}}'],
              pipeline='{{_base_.test_pipeline}}'))
test_pipeline = '{{_base_.test_pipeline}}'
evaluation = dict(interval=1, metric='acc')
