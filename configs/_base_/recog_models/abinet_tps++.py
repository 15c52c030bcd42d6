# ABINet + TPS++ — the combination the reference intends but ships broken
# (abinet_tps++.py references the deleted U_TPSnet, SURVEY §2.11); defined
# here the way abinet_ac.py means it: TPS_PP before ResNetABI stage 3.
_base_ = ['abinet.py']
model = dict(
    tpsnet=dict(type='TPS_PP', img_size=(16, 64),
                rectified_img_size=(16, 64), num_img_channel=64,
                point_size=(2, 16), p_stride=2),
    backbone=dict(type='ResNetABI', stem_channels=32, base_channels=32,
                  arch_settings=[3, 4, 6, 6, 3], strides=[1, 2, 2, 1, 1]),
)
