# reference configs/_base_/schedules/schedule_adam_custom_key_step_10e.py:
# freeze backbone + encoder via per-key lr multipliers (ABINet LM finetune)
ratio = 0.0
optimizer = dict(type='Adam', lr=1e-4,
                 paramwise_cfg=dict(
                     custom_keys={'backbone': dict(lr_mult=ratio),
                                  'encoder': dict(lr_mult=ratio)}))
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', step=[6, 9], warmup='linear',
                 warmup_iters=2, warmup_ratio=0.001, warmup_by_epoch=True)
total_epochs = 10
