# CRNN on the toy dataset (reference crnn_toy_dataset.py — model declared
# inline over the runtime/pipeline/toy-data/schedule bases, with the
# reference's data dict so the train/test CLIs run it end-to-end)
_base_ = [
    '../../_base_/default_runtime.py',
    '../../_base_/recog_pipelines/crnn_pipeline.py',
    '../../_base_/schedules/schedule_adadelta_5e.py',
    '../../_base_/recog_datasets/toy_data.py',
]

label_convertor = dict(type='CTCConvertor', dict_type='DICT36',
                       with_unknown=True, lower=True)

model = dict(
    type='CRNNNet',
    preprocessor=None,
    backbone=dict(type='VeryDeepVgg', leaky_relu=False, input_channels=1),
    encoder=None,
    decoder=dict(type='CRNNDecoder', in_channels=512, rnn_flag=True),
    loss=dict(type='CTCLoss'),
    label_convertor=label_convertor)

data = dict(
    samples_per_gpu=32,
    workers_per_gpu=2,
    train=dict(type='UniformConcatDataset', datasets='{{_base_.train_list}}',
               pipeline='{{_base_.train_pipeline}}'),
    test=dict(type='UniformConcatDataset', datasets='{{_base_.test_list}}',
              pipeline='{{_base_.test_pipeline}}'))
test_pipeline = '{{_base_.test_pipeline}}'
input_shape = (32, 100, 1)
evaluation = dict(interval=1, metric='acc')
