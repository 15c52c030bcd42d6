optimizer = dict(type='Adam', lr=1e-3)
lr_config = dict(step=[3, 4])
total_epochs = 5
