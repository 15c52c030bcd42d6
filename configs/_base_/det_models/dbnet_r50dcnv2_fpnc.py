# reference configs/_base_/det_models/dbnet_r50dcnv2_fpnc.py: ResNet-50
# with DCNv2 in stages 2-4 (ops/deform_conv.py) + FPNC
model = dict(
    type='DBNet',
    backbone=dict(type='ResNetDet50', stage_blocks=[3, 4, 6, 3],
                  base_channels=64,
                  dcn=dict(type='DCNv2', deform_groups=1),
                  stage_with_dcn=(False, True, True, True)),
    neck=dict(type='FPNC', in_channels=[256, 512, 1024, 2048],
              lateral_channels=256, out_channels=64),
    head=dict(type='DBHead', in_channels=256, k=50),
    loss=dict(type='DBLoss', alpha=5.0, beta=10.0, negative_ratio=3.0),
    postprocessor=dict(type='DBPostprocessor', text_repr_type='quad'),
    targets=dict(type='DBNetTargets', shrink_ratio=0.4))
