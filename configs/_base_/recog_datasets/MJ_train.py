# Syn90k-only training set (reference
# configs/_base_/recog_datasets/MJ_train.py)
train_root = 'data/mixture/Syn90k'

train_list = [
    dict(type='OCRDataset',
         img_prefix=f'{train_root}/mnt/ramdisk/max/90kDICT32px',
         ann_file=f'{train_root}/label.lmdb',
         loader=dict(type='LmdbLoader',
                     parser=dict(type='LineStrParser',
                                 keys=['filename', 'text'],
                                 keys_idx=[0, 1], separator=' ')),
         test_mode=False),
]
