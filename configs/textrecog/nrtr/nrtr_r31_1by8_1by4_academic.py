# NRTR baseline R31-1/8-1/4 (reference nrtr_r31_1by8_1by4_academic.py)
_base_ = ['./nrtr_r31_1by16_1by8_academic.py']
model = dict(
    backbone=dict(type='ResNet31OCR', layers=[1, 2, 5, 3],
                  channels=[32, 64, 128, 256, 512, 512],
                  stage4_pool_cfg=None, last_stage_pool=False))
