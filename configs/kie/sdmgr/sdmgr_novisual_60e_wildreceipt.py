# SDMGR without the visual modality
# (reference configs/kie/sdmgr/sdmgr_novisual_60e_wildreceipt.py)
model = dict(
    type='SDMGR',
    head=dict(type='SDMGRHead', num_chars=92, visual_dim=16,
              num_classes=26),
    visual_modality=False,
    loss=dict(type='SDMGRLoss'))

dataset_type = 'KIEDataset'
data_root = 'data/wildreceipt'

train = dict(
    type=dataset_type,
    ann_file=f'{data_root}/train.txt',
    dict_file=f'{data_root}/dict.txt',
    img_prefix=data_root,
    with_visual=False,
    test_mode=False)
test = dict(
    type=dataset_type,
    ann_file=f'{data_root}/test.txt',
    dict_file=f'{data_root}/dict.txt',
    img_prefix=data_root,
    with_visual=False,
    test_mode=True)

data = dict(samples_per_gpu=4, workers_per_gpu=4,
            train=train, val=test, test=test)

evaluation = dict(
    interval=1, metric='macro_f1',
    metric_options=dict(macro_f1=dict(
        ignores=[0, 2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 25])))

optimizer = dict(type='Adam', lr=1e-3, weight_decay=1e-4)
lr_config = dict(policy='step', warmup='linear', warmup_iters=1,
                 warmup_ratio=1, step=[40, 50])
total_epochs = 60
