img_norm_cfg = dict(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225])

train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='ResizeOCR', height=32, min_width=128, max_width=128,
         keep_aspect_ratio=False),
    dict(type='RandomWrapper', p=0.5, transforms=[
        dict(type='OneOfWrapper', transforms=[
            dict(type='RandomRotateTextDet', max_angle=15),
            dict(type='RandomAffine', degrees=15, translate=(0.3, 0.3),
                 scale=(0.5, 2.0), shear=(-45, 45)),
            dict(type='RandomPerspective', distortion_scale=0.5),
        ]),
    ]),
    dict(type='ToTensorOCR'),
    dict(type='NormalizeOCR', **img_norm_cfg),
    dict(type='Collect', keys=['img'],
         meta_keys=['filename', 'ori_shape', 'resize_shape', 'valid_ratio']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='ResizeOCR', height=32, min_width=128, max_width=128,
         keep_aspect_ratio=False),
    dict(type='ToTensorOCR'),
    dict(type='NormalizeOCR', **img_norm_cfg),
    dict(type='Collect', keys=['img'],
         meta_keys=['filename', 'ori_shape', 'resize_shape', 'valid_ratio']),
]
