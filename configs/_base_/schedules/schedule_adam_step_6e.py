optimizer = dict(type='Adam', lr=3e-4)
lr_config = dict(step=[4, 5])
total_epochs = 6
