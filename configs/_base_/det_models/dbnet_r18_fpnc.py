# reference configs/_base_/det_models/dbnet_r18_fpnc.py (mmdet.ResNet
# depth=18 -> ResNetDet BasicBlock trunk; bbox_head flattened to
# head/loss/postprocessor like our det builder expects)
model = dict(
    type='DBNet',
    backbone=dict(type='ResNetDet', stage_blocks=[2, 2, 2, 2],
                  base_channels=64),
    neck=dict(type='FPNC', in_channels=[64, 128, 256, 512],
              lateral_channels=256, out_channels=64),
    head=dict(type='DBHead', in_channels=256, k=50),
    loss=dict(type='DBLoss', alpha=5.0, beta=10.0, negative_ratio=3.0),
    postprocessor=dict(type='DBPostprocessor', text_repr_type='quad'),
    targets=dict(type='DBNetTargets', shrink_ratio=0.4))
