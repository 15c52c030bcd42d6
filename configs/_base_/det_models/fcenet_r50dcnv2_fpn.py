# reference configs/_base_/det_models/fcenet_r50dcnv2_fpn.py: DCNv2 in
# stages 2-4 (ops/deform_conv.py), CTW1500 postprocess thresholds
model = dict(
    type='FCENet',
    backbone=dict(type='ResNetDet50', stage_blocks=[3, 4, 6, 3],
                  base_channels=64,
                  dcn=dict(type='DCNv2', deform_groups=1),
                  stage_with_dcn=(False, True, True, True)),
    neck=dict(type='FPNDet', in_channels=[512, 1024, 2048],
              out_channels=256),
    head=dict(type='FCEHead', in_channels=256, fourier_degree=5),
    loss=dict(type='FCELoss', fourier_degree=5, num_sample=50, ohem_ratio=3),
    postprocessor=dict(type='FCEPostprocessor', fourier_degree=5,
                       num_reconstr_points=50, alpha=1.0, beta=2.0,
                       score_thr=0.3, nms_thr=0.1, scales=(8, 16, 32),
                       text_repr_type='poly'),
    targets=dict(type='FCENetTargets', fourier_degree=5))
