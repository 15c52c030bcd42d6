label_convertor = dict(type='AttnConvertor', dict_type='DICT36',
                       with_unknown=True, lower=True)
model = dict(
    type='NRTR',
    backbone=dict(type='NRTRModalityTransform'),
    # reference configs/_base_/recog_models/nrtr_modality_transform.py:7
    # uses a 12-layer encoder (decoder at the 6-layer default)
    encoder=dict(type='NRTREncoder', n_layers=12),
    decoder=dict(type='NRTRDecoder', n_layers=6),
    loss=dict(type='TFLoss'),
    label_convertor=label_convertor,
    max_seq_len=40)
