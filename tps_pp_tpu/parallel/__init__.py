from .mesh import create_mesh, param_sharding, batch_sharding, shard_batch, replicated
from .train import (TrainState, make_train_step, build_optimizer,
                    build_optimizer_from_run_cfg, make_lr_schedule,
                    shard_state)

__all__ = ['create_mesh', 'param_sharding', 'batch_sharding', 'shard_batch',
           'replicated', 'TrainState', 'make_train_step', 'build_optimizer',
           'build_optimizer_from_run_cfg',
           'make_lr_schedule', 'shard_state']
