# Openset SDMGR: bg/key/value/others node classes, edge-linked kv pairs
# (reference configs/kie/sdmgr/sdmgr_novisual_60e_wildreceipt_openset.py).
# Produce openset_{train,test}.txt from the closeset files with
# tools/data/closeset_to_openset.py.
model = dict(
    type='SDMGR',
    head=dict(type='SDMGRHead', num_chars=92, visual_dim=16,
              num_classes=4),
    visual_modality=False,
    openset=True,
    loss=dict(type='SDMGRLoss'))

dataset_type = 'OpensetKIEDataset'
data_root = 'data/wildreceipt'

train = dict(
    type=dataset_type,
    ann_file=f'{data_root}/openset_train.txt',
    dict_file=f'{data_root}/dict.txt',
    img_prefix=data_root,
    link_type='one-to-many',
    test_mode=False)
test = dict(
    type=dataset_type,
    ann_file=f'{data_root}/openset_test.txt',
    dict_file=f'{data_root}/dict.txt',
    img_prefix=data_root,
    link_type='one-to-many',
    test_mode=True)

data = dict(samples_per_gpu=4, workers_per_gpu=1,
            train=train, val=test, test=test)

evaluation = dict(interval=1, metric='openset_f1', metric_options=None)

optimizer = dict(type='Adam', weight_decay=1e-4)
lr_config = dict(policy='step', warmup='linear', warmup_iters=1,
                 warmup_ratio=1, step=[40, 50])
total_epochs = 60
