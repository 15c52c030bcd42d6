# reference configs/_base_/det_models/panet_r18_fpem_ffm.py: poly (ctw1500)
# and quad (icdar) variants
model_poly = dict(
    type='PANet',
    backbone=dict(type='ResNetDet', stage_blocks=[2, 2, 2, 2],
                  base_channels=64),
    neck=dict(type='FPEM_FFM', in_channels=[64, 128, 256, 512],
              conv_out=128),
    head=dict(type='PANHead', out_channels=6),
    loss=dict(type='PANLoss', alpha=0.5, beta=0.25, delta_aggregation=0.5,
              delta_discrimination=3, ohem_ratio=3),
    postprocessor=dict(type='PANPostprocessor', text_repr_type='poly'),
    targets=dict(type='PANetTargets', shrink_ratio=(1.0, 0.7)))

model_quad = dict(
    type='PANet',
    backbone=dict(type='ResNetDet', stage_blocks=[2, 2, 2, 2],
                  base_channels=64),
    neck=dict(type='FPEM_FFM', in_channels=[64, 128, 256, 512],
              conv_out=128),
    head=dict(type='PANHead', out_channels=6),
    loss=dict(type='PANLoss', alpha=0.5, beta=0.25, delta_aggregation=0.5,
              delta_discrimination=3, ohem_ratio=3),
    postprocessor=dict(type='PANPostprocessor', text_repr_type='quad'),
    targets=dict(type='PANetTargets', shrink_ratio=(1.0, 0.5),
                 max_shrink=20))
