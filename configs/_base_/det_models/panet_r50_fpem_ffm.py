# reference configs/_base_/det_models/panet_r50_fpem_ffm.py
model = dict(
    type='PANet',
    backbone=dict(type='ResNetDet50', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    neck=dict(type='FPEM_FFM', in_channels=[256, 512, 1024, 2048],
              conv_out=128),
    head=dict(type='PANHead', out_channels=6),
    loss=dict(type='PANLoss', alpha=0.5, beta=0.25, delta_aggregation=0.5,
              delta_discrimination=3, ohem_ratio=3),
    postprocessor=dict(type='PANPostprocessor', text_repr_type='poly'),
    targets=dict(type='PANetTargets', shrink_ratio=(1.0, 0.5),
                 max_shrink=20))
