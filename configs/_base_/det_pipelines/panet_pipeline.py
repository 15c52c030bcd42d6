# reference configs/_base_/det_pipelines/panet_pipeline.py (see
# dbnet_pipeline.py for how det pipelines map onto this framework's loop)
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)

train_pipeline_ctw1500 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='ColorJitter', brightness=32.0 / 255, saturation=0.5),
    dict(type='PANetTargets', shrink_ratio=(1.0, 0.7)),
    dict(type='RandomRotateTextDet'),
    dict(type='Collect', keys=['img', 'gt_kernels', 'gt_mask'],
         img_scale=(3000, 640), target_size=(640, 640)),
]

test_pipeline_ctw1500 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='Collect', keys=['img'], img_scale=(3000, 640)),
]

train_pipeline_icdar2015 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='ColorJitter', brightness=32.0 / 255, saturation=0.5),
    dict(type='PANetTargets', shrink_ratio=(1.0, 0.5), max_shrink=20),
    dict(type='RandomRotateTextDet'),
    dict(type='Collect', keys=['img', 'gt_kernels', 'gt_mask'],
         img_scale=(3000, 736), target_size=(736, 736)),
]

test_pipeline_icdar2015 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='Collect', keys=['img'], img_scale=(1333, 736)),
]

train_pipeline_icdar2017 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='ColorJitter', brightness=32.0 / 255, saturation=0.5),
    dict(type='PANetTargets', shrink_ratio=(1.0, 0.5), max_shrink=20),
    dict(type='RandomRotateTextDet'),
    dict(type='Collect', keys=['img', 'gt_kernels', 'gt_mask'],
         img_scale=(3000, 800), target_size=(800, 800)),
]

test_pipeline_icdar2017 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='Collect', keys=['img'], img_scale=(1333, 800)),
]
