# reference configs/_base_/det_pipelines/dbnet_pipeline.py.
# In this framework the det train loop (apis/train_det.py) applies host-side
# aug + target generation itself: the pipeline lists below keep the
# reference's key names and the knobs our stack consumes (aug params, target
# hyperparams, test scales -> det_img_size); mmdet-only formatting steps
# (ImageToTensor/Pad/MultiScaleFlipAug) are internalized by TextDetector.
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)

train_pipeline_r18 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='ColorJitter', brightness=32.0 / 255, saturation=0.5),
    dict(type='RandomRotateTextDet', rotate_ratio=1.0, max_angle=10),
    dict(type='DBNetTargets', shrink_ratio=0.4),
    dict(type='Collect',
         keys=['img', 'gt_shrink', 'gt_shrink_mask', 'gt_thr',
               'gt_thr_mask']),
]

test_pipeline_1333_736 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='Collect', keys=['img'], img_scale=(1333, 736)),
]

# for dbnet_r50dcnv2_fpnc
img_norm_cfg_r50dcnv2 = dict(
    mean=[122.67891434, 116.66876762, 104.00698793],
    std=[58.395, 57.12, 57.375], to_rgb=True)

train_pipeline_r50dcnv2 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='ColorJitter', brightness=32.0 / 255, saturation=0.5),
    dict(type='RandomRotateTextDet', rotate_ratio=1.0, max_angle=10),
    dict(type='DBNetTargets', shrink_ratio=0.4),
    dict(type='Collect',
         keys=['img', 'gt_shrink', 'gt_shrink_mask', 'gt_thr',
               'gt_thr_mask']),
]

test_pipeline_4068_1024 = [
    dict(type='LoadImageFromFile', color_type='color_ignore_orientation'),
    dict(type='Collect', keys=['img'], img_scale=(4068, 1024)),
]
