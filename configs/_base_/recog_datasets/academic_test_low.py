# Standard 6-benchmark evaluation set with the LOW-count IC13/IC15 splits
# (reference configs/_base_/recog_datasets/academic_test_low.py:
# IC13 test_label_1015, IC15 full test_label — vs academic_test_high's
# IC13_857 / IC15_1811 splits)
test_root = 'data/mixture'

_subs = [('IIIT5K', 'test_label.txt'), ('svt', 'test_label.txt'),
         ('icdar_2013', 'test_label_1015.txt'),
         ('icdar_2015', 'test_label.txt'), ('svtp', 'test_label.txt'),
         ('ct80', 'test_label.txt')]

test_list = [
    dict(type='OCRDataset',
         img_prefix=f'{test_root}/{sub}/',
         ann_file=f'{test_root}/{sub}/{ann}',
         loader=dict(type='HardDiskLoader',
                     parser=dict(type='LineStrParser',
                                 keys=['filename', 'text'],
                                 keys_idx=[0, 1], separator=' ')),
         test_mode=True)
    for sub, ann in _subs
]
