# reference configs/_base_/det_models/drrg_r50_fpn_unet.py
model = dict(
    type='DRRG',
    backbone=dict(type='ResNetDet50', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    neck=dict(type='FPN_UNet', in_channels=[256, 512, 1024, 2048],
              out_channels=32),
    targets=dict(type='DRRGTargets'))
