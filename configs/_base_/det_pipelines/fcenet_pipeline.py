# reference configs/_base_/det_pipelines/fcenet_pipeline.py (see
# dbnet_pipeline.py for how det pipelines map onto this framework's loop)
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)

# for icdar2015
leval_prop_range_icdar2015 = ((0, 0.4), (0.3, 0.7), (0.6, 1.0))
train_pipeline_icdar2015 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='ColorJitter', brightness=32.0 / 255, saturation=0.5,
         contrast=0.5),
    dict(type='RandomRotateTextDet', rotate_ratio=0.5, max_angle=30),
    dict(type='FCENetTargets', fourier_degree=5,
         level_proportion_range=leval_prop_range_icdar2015),
    dict(type='Collect', keys=['img', 'p3_maps', 'p4_maps', 'p5_maps'],
         img_scale=(800, 800)),
]

test_pipeline_icdar2015 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='Collect', keys=['img'], img_scale=(2260, 2260)),
]

# for ctw1500
leval_prop_range_ctw1500 = ((0, 0.25), (0.2, 0.65), (0.55, 1.0))
train_pipeline_ctw1500 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='ColorJitter', brightness=32.0 / 255, saturation=0.5,
         contrast=0.5),
    dict(type='RandomRotateTextDet', rotate_ratio=0.5, max_angle=30),
    dict(type='FCENetTargets', fourier_degree=5,
         level_proportion_range=leval_prop_range_ctw1500),
    dict(type='Collect', keys=['img', 'p3_maps', 'p4_maps', 'p5_maps'],
         img_scale=(800, 800)),
]

test_pipeline_ctw1500 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='Collect', keys=['img'], img_scale=(1080, 736)),
]
