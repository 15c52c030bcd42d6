# reference configs/_base_/det_models/ocr_mask_rcnn_r50_fpn_ohem_poly.py
model = dict(
    type='OCRMaskRCNN',
    backbone=dict(type='ResNetDet50', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    neck=dict(type='FPNDet', in_channels=[256, 512, 1024, 2048],
              out_channels=256),
    rpn_head=dict(type='RPNHead', feat_channels=256, num_anchors=5),
    text_repr_type='poly')
