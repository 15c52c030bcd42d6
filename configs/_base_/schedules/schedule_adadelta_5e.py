optimizer = dict(type='Adadelta', lr=1.0)
lr_config = dict()
total_epochs = 5
