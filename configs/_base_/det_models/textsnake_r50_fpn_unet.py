# reference configs/_base_/det_models/textsnake_r50_fpn_unet.py
model = dict(
    type='TextSnake',
    backbone=dict(type='ResNetDet50', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    neck=dict(type='FPN_UNet', in_channels=[256, 512, 1024, 2048],
              out_channels=32),
    head=dict(type='TextSnakeHead', out_channels=5),
    loss=dict(type='TextSnakeLoss', ohem_ratio=3.0),
    postprocessor=dict(type='TextSnakePostprocessor', text_repr_type='poly'),
    targets=dict(type='TextSnakeTargets'))
