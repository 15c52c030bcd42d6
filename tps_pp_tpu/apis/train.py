"""train_recognizer — the training loop (reference ``apis/train.py:19-151``).

Replaces mmcv's EpochBasedRunner + hook zoo with a plain loop around the
jitted sharded train step from parallel/train.py:

  per iter : train_step(state, batch, rng) -> (state, metrics)
             [grad psum over 'data' inserted by XLA = DDP backward;
              metric means over the sharded batch = log-var all_reduce,
              reference recognizer/base.py:124-127]
  per epoch: checkpoint save (CheckpointHook), optional evaluation
             (EvalHook -> eval_recognizer), logging (TextLoggerHook).
"""
from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..datasets.ocr_dataset import DataLoader
from ..parallel import (TrainState, build_optimizer_from_run_cfg,
                        create_mesh, make_train_step, shard_state)
from ..utils.platform import training_rng
from .test import eval_recognizer

logger = logging.getLogger('tps_pp_tpu')


def train_recognizer(rec, train_dataset, cfg: Dict,
                     val_dataset=None,
                     work_dir: Optional[str] = None,
                     resume_from: Optional[str] = None,
                     load_from: Optional[str] = None,
                     seed: int = 0,
                     mesh=None):
    """cfg keys (reference config names): samples_per_gpu, total_epochs,
    optimizer{type,lr,...}, lr_config{warmup_epochs, step}, log_interval,
    input_shape (H, W, C)."""
    batch_size = int(cfg.get('samples_per_gpu', 64))
    total_epochs = int(cfg.get('total_epochs', 12))
    log_interval = int(cfg.get('log_interval', 50))
    h, w, c = cfg.get('input_shape', (32, 128, 3))

    if mesh is None and len(jax.devices()) > 1:
        mesh = create_mesh()
    if mesh is not None:
        n_data = mesh.shape['data']
        if batch_size % n_data:
            batch_size = ((batch_size + n_data - 1) // n_data) * n_data
            logger.info('batch size rounded up to %d (multiple of the '
                        "mesh's %d-way data axis)", batch_size, n_data)
    # 'spawn' workers: forking after the JAX/TPU backend initialized (its
    # gRPC/runtime threads may hold locks) risks deadlocked children
    loader = DataLoader(train_dataset, batch_size, shuffle=True, seed=seed,
                        num_workers=int(cfg.get('workers_per_gpu', 0)),
                        mp_context='spawn')
    steps_per_epoch = len(loader)

    tx, schedule = build_optimizer_from_run_cfg(
        cfg, steps_per_epoch=steps_per_epoch, total_epochs=total_epochs)

    variables = rec.init_variables(jax.random.PRNGKey(seed),
                                   (batch_size, h, w, c))
    if load_from:
        from ..utils.checkpoint import CheckpointManager, load_variables
        if load_from.endswith('.npz'):
            variables = load_variables(load_from, variables)
        else:
            variables = CheckpointManager(load_from).load_weights(variables)
    state = TrainState.create(variables, tx)

    ckpt_mgr = None
    if work_dir:
        from ..utils.checkpoint import CheckpointManager
        ckpt_mgr = CheckpointManager(work_dir)
    if resume_from:
        # resume_from is a PATH (reference --resume-from semantics): an
        # orbax directory, optionally with a trailing step component. It
        # must not be silently aliased to work_dir's latest checkpoint.
        import os as _os
        from ..utils.checkpoint import CheckpointManager
        rdir = _os.path.normpath(str(resume_from))
        rstep = None
        if _os.path.basename(rdir).isdigit():
            rdir, rstep = _os.path.dirname(rdir), int(_os.path.basename(rdir))
        mgr = (ckpt_mgr if work_dir and
               _os.path.abspath(rdir) == _os.path.abspath(work_dir)
               else CheckpointManager(rdir))
        state = mgr.restore(state, step=rstep)
        logger.info('resumed from %s step %d', rdir, int(state.step))

    if mesh is not None:
        state = shard_state(state, mesh)
    train_step = make_train_step(
        rec, mesh=mesh, remat=str(cfg.get('remat', 'none')))
    # dropout rng: hardware RNG on TPU unless cfg pins an impl
    # (utils/platform.training_rng — measured 21.4 ms/step at B=512)
    rng = training_rng(seed + 1, str(cfg.get('rng_impl', 'auto')))

    # a resumed job continues from its epoch, not from 0 (the reference
    # runner restores the epoch counter; replaying would overshoot the
    # schedule by up to total_epochs extra epochs)
    start_epoch = min(int(state.step) // max(steps_per_epoch, 1),
                      total_epochs)
    history = []
    for epoch in range(start_epoch, total_epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        for it, host_batch in enumerate(loader):
            td = rec.label_convertor.str2tensor(host_batch['texts'])
            batch = {
                'img': host_batch['img'],
                'valid_ratio': host_batch['valid_ratio'],
                'padded_targets': np.asarray(td['padded_targets']),
            }
            if 'target_lengths' in td:
                batch['target_lengths'] = np.asarray(td['target_lengths'])
            state, metrics = train_step(state, batch, rng)
            if it % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                ips = batch['img'].shape[0] * (it + 1) / max(
                    time.time() - t0, 1e-9)
                logger.info('epoch %d iter %d/%d %s img/s=%.1f lr=%.2e',
                            epoch, it, steps_per_epoch, m, ips,
                            float(schedule(int(state.step))))
                history.append(dict(epoch=epoch, iter=it, **m))
        if ckpt_mgr is not None:
            ckpt_mgr.save(int(state.step), state)
        if val_dataset is not None:
            res = eval_recognizer(rec, state.variables(), val_dataset,
                                  batch_size=batch_size, mesh=mesh)
            logger.info('epoch %d eval: %s', epoch, res)
            history.append(dict(epoch=epoch, eval=res))
    return state, history
