# the 6 academic STR benchmarks, "low" splits (reference configs/_base_/
# recog_datasets/academic_test.py: IC13 1015 / full IC15 — use
# academic_test_high.py for the IC13_857/IC15_1811 paper protocol).
# Point test_root at your local copies.
test_root = 'data/mixture'

def _ds(name):
    return dict(
        type='OCRDataset',
        img_prefix=f'{test_root}/{name}',
        ann_file=f'{test_root}/{name}/test_label.txt',
        loader=dict(type='HardDiskLoader',
                    parser=dict(type='LineStrParser',
                                keys=['filename', 'text'],
                                keys_idx=[0, 1], separator=' ')),
        test_mode=True)

test_list = [_ds(n) for n in
             ['IIIT5K', 'svt', 'icdar_2013', 'icdar_2015', 'svtp', 'ct80']]
