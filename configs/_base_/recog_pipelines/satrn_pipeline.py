# SATRN recipe: fixed 32x100 resize, 3-rotation TTA at test time
# (reference configs/_base_/recog_pipelines/satrn_pipeline.py)
img_norm_cfg = dict(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225])
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='ResizeOCR', height=32, min_width=100, max_width=100,
         keep_aspect_ratio=False, width_downsample_ratio=0.25),
    dict(type='ToTensorOCR'),
    dict(type='NormalizeOCR', **img_norm_cfg),
    dict(type='Collect', keys=['img'],
         meta_keys=['filename', 'ori_shape', 'img_shape', 'text',
                    'valid_ratio', 'resize_shape']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiRotateAugOCR', rotate_degrees=[0, 90, 270],
         transforms=[
             dict(type='ResizeOCR', height=32, min_width=100, max_width=100,
                  keep_aspect_ratio=False, width_downsample_ratio=0.25),
             dict(type='ToTensorOCR'),
             dict(type='NormalizeOCR', **img_norm_cfg),
             dict(type='Collect', keys=['img'],
                  meta_keys=['filename', 'ori_shape', 'img_shape',
                             'valid_ratio', 'resize_shape']),
         ])
]
