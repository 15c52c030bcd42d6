# THE FLAGSHIP — NRTR + TPS++ (reference configs/textrecog/nrtr/nrtr_tps++.py
# :26-63), with the consistent stride geometry [1,2,2,1,2] replacing the
# shipped [2,1,2,1,2] typo (SURVEY §2.3).
_base_ = [
    '../../_base_/default_runtime.py',
    '../../_base_/schedules/schedule_adam_step_12e.py',
    '../../_base_/recog_pipelines/crnn_pp_pipeline.py',
    '../../_base_/recog_datasets/ST_MJ_alphanumeric_train.py',
    '../../_base_/recog_datasets/academic_test_high.py',
]

label_convertor = dict(type='AttnConvertor', dict_type='DICT90',
                       with_unknown=True)

model = dict(
    type='NRTR',
    backbone=dict(type='ResNetABI_v2_large', in_channels=3,
                  stem_channels=32, base_channels=32,
                  arch_settings=[3, 4, 6, 6, 3], strides=[1, 2, 2, 1, 2]),
    tpsnet=dict(type='TPS_PP', img_size=(16, 64),
                rectified_img_size=(16, 64), num_img_channel=64,
                point_size=(2, 16), p_stride=2),
    # d_inner=256: the reference flagship config leaves NRTREncoder /
    # NRTRDecoder at their defaults (nrtr_encoder.py:37, nrtr_decoder.py:49
    # — d_inner=256), so the released checkpoint's FFN weights are 512x256.
    encoder=dict(type='NRTREncoder', n_layers=6, n_head=8, d_k=64, d_v=64,
                 d_model=512, d_inner=256, dropout=0.1),
    decoder=dict(type='NRTRDecoder', n_layers=6, d_embedding=512, n_head=8,
                 d_model=512, d_inner=256, d_k=64, d_v=64),
    loss=dict(type='TFLoss'),
    label_convertor=label_convertor,
    max_seq_len=40)

data = dict(
    samples_per_gpu=280,
    workers_per_gpu=10,
    train=dict(type='UniformConcatDataset',
               datasets='{{_base_.train_list}}',
               pipeline='{{_base_.train_pipeline}}'),
    val=dict(type='UniformConcatDataset',
             datasets='{{_base_.test_list}}',
             pipeline='{{_base_.test_pipeline}}'),
    test=dict(type='UniformConcatDataset',
              datasets='{{_base_.test_list}}',
              pipeline='{{_base_.test_pipeline}}'))

test_pipeline = '{{_base_.test_pipeline}}'
evaluation = dict(interval=1, metric='acc')
