# reference configs/_base_/det_models/fcenet_r50_fpn.py
model = dict(
    type='FCENet',
    backbone=dict(type='ResNetDet50', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    neck=dict(type='FPNDet', in_channels=[512, 1024, 2048],
              out_channels=256),
    head=dict(type='FCEHead', in_channels=256, fourier_degree=5),
    loss=dict(type='FCELoss', fourier_degree=5, num_sample=50, ohem_ratio=3),
    postprocessor=dict(type='FCEPostprocessor', fourier_degree=5,
                       num_reconstr_points=50, alpha=1.2, beta=1.0,
                       score_thr=0.3, nms_thr=0.1, scales=(8, 16, 32)),
    targets=dict(type='FCENetTargets', fourier_degree=5))
