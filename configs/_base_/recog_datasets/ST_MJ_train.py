# Syn90k + SynthText training mixture, unfiltered labels (reference
# configs/_base_/recog_datasets/ST_MJ_train.py — the alphanumeric-filtered
# variant lives in ST_MJ_alphanumeric_train.py)
train_root = 'data/mixture'

train_list = [
    dict(type='OCRDataset',
         img_prefix=f'{train_root}/Syn90k/mnt/ramdisk/max/90kDICT32px',
         ann_file=f'{train_root}/Syn90k/label.lmdb',
         loader=dict(type='LmdbLoader',
                     parser=dict(type='LineStrParser',
                                 keys=['filename', 'text'],
                                 keys_idx=[0, 1], separator=' ')),
         test_mode=False),
    dict(type='OCRDataset',
         img_prefix=f'{train_root}/SynthText/synthtext/SynthText_patch_horizontal',
         ann_file=f'{train_root}/SynthText/label.lmdb',
         loader=dict(type='LmdbLoader',
                     parser=dict(type='LineStrParser',
                                 keys=['filename', 'text'],
                                 keys_idx=[0, 1], separator=' ')),
         test_mode=False),
]
