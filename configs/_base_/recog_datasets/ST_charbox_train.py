# SynthText with character-level boxes, for segmentation-based recognition
# (reference configs/_base_/recog_datasets/ST_charbox_train.py)
train_img_root = 'data/mixture'

train_list = [
    dict(type='OCRSegDataset',
         img_prefix=f'{train_img_root}/SynthText',
         ann_file=f'{train_img_root}/SynthText/instances_train.txt',
         loader=dict(type='HardDiskLoader',
                     parser=dict(type='LineJsonParser',
                                 keys=['file_name', 'annotations', 'text'])),
         test_mode=False),
]
