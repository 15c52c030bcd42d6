# reference configs/_base_/det_pipelines/maskrcnn_pipeline.py (see
# dbnet_pipeline.py for how det pipelines map onto this framework's loop)
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)

train_pipeline = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='ColorJitter', brightness=32.0 / 255, saturation=0.5),
    dict(type='RandomRotateTextDet', rotate_ratio=0.5, max_angle=10),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks'],
         img_scale=(1600, 800)),
]

test_pipeline_ctw1500 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='Collect', keys=['img'], img_scale=(1600, 1600)),
]

test_pipeline_icdar2015 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='Collect', keys=['img'], img_scale=(1920, 1920)),
]
