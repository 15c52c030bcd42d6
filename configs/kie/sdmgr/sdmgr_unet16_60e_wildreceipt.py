# SDMGR KIE (reference configs/kie/sdmgr/...)
model = dict(
    type='SDMGR',
    head=dict(type='SDMGRHead', num_chars=92, visual_dim=16,
              num_classes=26),
    loss=dict(type='SDMGRLoss'))
optimizer = dict(type='Adam', lr=1e-3, weight_decay=1e-4)
total_epochs = 60
