# SATRN-small (reference configs/textrecog/satrn/satrn_small.py: smaller
# dims, 6/6 -> d_model 256)
_base_ = ['./satrn_academic.py']
model = dict(
    backbone=dict(type='ShallowCNN', input_channels=3, hidden_dim=256),
    encoder=dict(type='SatrnEncoder', n_layers=6, n_head=8, d_k=32, d_v=32,
                 d_model=256, d_inner=512),
    decoder=dict(type='NRTRDecoder', n_layers=6, d_embedding=256, n_head=8,
                 d_model=256, d_inner=512, d_k=32, d_v=32))
