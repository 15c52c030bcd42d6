# CRNN on the toy dataset (reference crnn_toy_dataset.py — model declared
# inline over the runtime/pipeline/toy-data/schedule bases; stacking the
# full academic config with a second dataset base would duplicate keys,
# which the config system rejects like mmcv)
_base_ = [
    '../../_base_/default_runtime.py',
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

test_pipeline = [
    dict(type='LoadImageFromFile', color_type='grayscale'),
    dict(type='ResizeOCR', height=32, min_width=32, max_width=None,
         keep_aspect_ratio=True),
    dict(type='ToTensorOCR'),
    dict(type='NormalizeOCR', mean=[0.5], std=[0.5]),
    dict(type='Collect', keys=['img']),
]
