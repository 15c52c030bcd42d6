# reference configs/_base_/det_pipelines/textsnake_pipeline.py (see
# dbnet_pipeline.py for how det pipelines map onto this framework's loop)
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)

train_pipeline = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='ColorJitter', brightness=32.0 / 255, saturation=0.5),
    dict(type='RandomRotateTextDet', rotate_ratio=0.5, max_angle=20),
    dict(type='TextSnakeTargets'),
    dict(type='Collect',
         keys=['img', 'gt_text_mask', 'gt_center_region_mask', 'gt_mask',
               'gt_radius_map', 'gt_sin_map', 'gt_cos_map'],
         img_scale=(3000, 736), target_size=(800, 800)),
]

test_pipeline = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='Collect', keys=['img'], img_scale=(1333, 736)),
]
