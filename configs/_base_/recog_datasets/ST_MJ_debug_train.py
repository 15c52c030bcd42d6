# Debug-scale training set: SynthText shuffle_labels only (reference
# configs/_base_/recog_datasets/ST_MJ_debug_train.py, where the Syn90k
# half is commented out)
train_root = 'data/mixture'

train_list = [
    dict(type='OCRDataset',
         img_prefix=f'{train_root}/SynthText/synthtext/SynthText_patch_horizontal',
         ann_file=f'{train_root}/SynthText/shuffle_labels.lmdb',
         loader=dict(type='LmdbLoader',
                     parser=dict(type='LineStrParser',
                                 keys=['filename', 'text'],
                                 keys_idx=[0, 1], separator=' ')),
         test_mode=False),
]
