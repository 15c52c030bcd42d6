# reference configs/_base_/det_models/psenet_r50_fpnf.py: poly (ctw1500)
# and quad (icdar) variants
model_poly = dict(
    type='PSENet',
    backbone=dict(type='ResNetDet50', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    neck=dict(type='FPNF', in_channels=[256, 512, 1024, 2048],
              out_channels=256, fusion_type='concat'),
    head=dict(type='PSEHead', out_channels=7),
    loss=dict(type='PSELoss', alpha=0.7, ohem_ratio=3,
              kernel_sample_type='adaptive'),
    postprocessor=dict(type='PSEPostprocessor', text_repr_type='poly'),
    targets=dict(type='PSENetTargets',
                 shrink_ratio=(1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4),
                 max_shrink=20))

model_quad = dict(
    type='PSENet',
    backbone=dict(type='ResNetDet50', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    neck=dict(type='FPNF', in_channels=[256, 512, 1024, 2048],
              out_channels=256, fusion_type='concat'),
    head=dict(type='PSEHead', out_channels=7),
    loss=dict(type='PSELoss', alpha=0.7, ohem_ratio=3,
              kernel_sample_type='adaptive'),
    postprocessor=dict(type='PSEPostprocessor', text_repr_type='quad'),
    targets=dict(type='PSENetTargets',
                 shrink_ratio=(1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4),
                 max_shrink=20))
