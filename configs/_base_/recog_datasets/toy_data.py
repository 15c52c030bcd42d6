# toy dataset for smoke tests (reference configs/_base_/recog_datasets/
# toy_data.py -> tests/data/ocr_toy_dataset)
import os
_root = os.path.join(os.path.dirname(__file__), '../../..',
                     'tests/data/ocr_toy_dataset')
_root = os.path.abspath(_root)

train = dict(
    type='OCRDataset',
    img_prefix=_root,
    ann_file=os.path.join(_root, 'label.txt'),
    loader=dict(type='HardDiskLoader', repeat=10,
                parser=dict(type='LineStrParser',
                            keys=['filename', 'text'],
                            keys_idx=[0, 1], separator=' ')),
    test_mode=False)

test = dict(
    type='OCRDataset',
    img_prefix=_root,
    ann_file=os.path.join(_root, 'label.txt'),
    loader=dict(type='HardDiskLoader', repeat=1,
                parser=dict(type='LineStrParser',
                            keys=['filename', 'text'],
                            keys_idx=[0, 1], separator=' ')),
    test_mode=True)

# the reference exposes list forms too (toy_data.py:54-56); leaf configs
# reference either {{_base_.train}} or {{_base_.train_list}}
train_list = [train]
test_list = [test]
