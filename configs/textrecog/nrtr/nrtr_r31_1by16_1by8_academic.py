# NRTR baseline R31-1/16-1/8 (reference configs/textrecog/nrtr/
# nrtr_r31_1by16_1by8_academic.py; zoo acc in BASELINE.md row 3)
_base_ = [
    '../../_base_/default_runtime.py',
    '../../_base_/schedules/schedule_adam_step_6e.py',
    '../../_base_/recog_pipelines/nrtr_pipeline.py',
    '../../_base_/recog_datasets/academic_test_high.py',
]
label_convertor = dict(type='AttnConvertor', dict_type='DICT90',
                       with_unknown=True)
model = dict(
    type='NRTR',
    backbone=dict(type='ResNet31OCR', layers=[1, 2, 5, 3],
                  channels=[32, 64, 128, 256, 512, 512],
                  stage4_pool_cfg=dict(kernel_size=(2, 1), stride=(2, 1)),
                  last_stage_pool=True),
    encoder=dict(type='NRTREncoder'),
    decoder=dict(type='NRTRDecoder'),
    loss=dict(type='TFLoss'),
    label_convertor=label_convertor,
    max_seq_len=40)
test_pipeline = '{{_base_.test_pipeline}}'
evaluation = dict(interval=1, metric='acc')
