# Flagship topology on the toy dataset (smoke/CI variant; the real recipe
# lives in nrtr_tps++.py wired to ST_MJ + academic_test_high). The toy
# datasets are declared inline as CHILD overrides: stacking toy_data.py as
# a second base would duplicate the train/test keys the flagship's dataset
# bases already define, which the config system rejects like mmcv.
import os

_base_ = ['./nrtr_tps++.py']

_root = os.path.abspath(os.path.join(
    os.path.dirname(__file__), '../../..', 'tests/data/ocr_toy_dataset'))
_loader = dict(type='HardDiskLoader',
               parser=dict(type='LineStrParser', keys=['filename', 'text'],
                           keys_idx=[0, 1], separator=' '))
_toy_train = dict(type='OCRDataset', img_prefix=_root,
                  ann_file=os.path.join(_root, 'label.txt'),
                  loader=dict(_loader, repeat=10), test_mode=False)
_toy_test = dict(type='OCRDataset', img_prefix=_root,
                 ann_file=os.path.join(_root, 'label.txt'),
                 loader=dict(_loader, repeat=1), test_mode=True)

data = dict(
    _delete_=True,
    samples_per_gpu=4,
    workers_per_gpu=0,
    train=dict(type='UniformConcatDataset', datasets=[_toy_train],
               pipeline='{{_base_.train_pipeline}}'),
    val=dict(type='UniformConcatDataset', datasets=[_toy_test],
             pipeline='{{_base_.test_pipeline}}'),
    test=dict(type='UniformConcatDataset', datasets=[_toy_test],
              pipeline='{{_base_.test_pipeline}}'))
