# Mixed synthetic + real training set: IC11/13/15, COCO-Text, IIIT5K
# (each repeated 20x) plus SynthText-Add, SynthText shuffle, Syn90k shuffle
# (reference configs/_base_/recog_datasets/ST_SA_MJ_real_train.py — the
# SAR/RobustScanner recipe)
train_prefix = 'data/mixture'

def _real(sub):
    return dict(type='OCRDataset',
                img_prefix=f'{train_prefix}/{sub}',
                ann_file=f'{train_prefix}/{sub}/train_label.txt',
                loader=dict(type='HardDiskLoader', repeat=20,
                            parser=dict(type='LineStrParser',
                                        keys=['filename', 'text'],
                                        keys_idx=[0, 1], separator=' ')),
                test_mode=False)

def _synth(sub, ann):
    return dict(type='OCRDataset',
                img_prefix=f'{train_prefix}/{sub}',
                ann_file=f'{train_prefix}/{sub}/{ann}',
                loader=dict(type='HardDiskLoader',
                            parser=dict(type='LineStrParser',
                                        keys=['filename', 'text'],
                                        keys_idx=[0, 1], separator=' ')),
                test_mode=False)

train_list = [
    _real('icdar_2011'), _real('icdar_2013'), _real('icdar_2015'),
    _real('coco_text'), _real('IIIT5K'),
    _synth('SynthText_Add', 'label.txt'),
    _synth('SynthText', 'shuffle_labels.txt'),
    _synth('Syn90k', 'shuffle_labels.txt'),
]
