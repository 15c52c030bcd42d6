# The 6 academic STR benchmarks, "high" splits (reference configs/_base_/
# recog_datasets/academic_test_high.py:14-19): IIIT5K 3000 / SVT 647 /
# IC13 **857** / IC15 **1811** / SVTP 645 / CT80 288 — the protocol behind
# the paper numbers in BASELINE.md.
test_root = 'data/mixture'

_SPECS = [
    ('IIIT5K', 'test_label.txt'),
    ('svt', 'test_label.txt'),
    ('icdar_2013', 'IC13_857.txt'),
    ('icdar_2015', 'IC15_1811.txt'),
    ('svtp', 'test_label.txt'),
    ('ct80', 'test_label.txt'),
]

def _ds(name, ann):
    return dict(
        type='OCRDataset',
        img_prefix=f'{test_root}/{name}',
        ann_file=f'{test_root}/{name}/{ann}',
        loader=dict(type='HardDiskLoader',
                    parser=dict(type='LineStrParser',
                                keys=['filename', 'text'],
                                keys_idx=[0, 1], separator=' ')),
        test_mode=True)

test_list = [_ds(n, a) for n, a in _SPECS]
test = test_list
