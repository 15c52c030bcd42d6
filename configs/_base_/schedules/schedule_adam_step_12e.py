# TPS++ recipe (reference configs/_base_/schedules/schedule_adam_step_12e.py):
# Adam 1e-4, 1-epoch linear warmup ratio 1e-3, decay x0.1 at epochs 8 and 10
optimizer = dict(type='Adam', lr=1e-4)
lr_config = dict(warmup_epochs=1, warmup_ratio=1e-3, step=[8, 10], gamma=0.1)
total_epochs = 12
