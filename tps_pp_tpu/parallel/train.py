"""Sharded train/eval step factories.

The TPU-native replacement for the reference's EpochBasedRunner +
OptimizerHook loop (reference apis/train.py:19-151; train_step at
recognizer/base.py:131-164): one jitted ``train_step(state, batch, rng) ->
(state, metrics)`` with params placed by the mesh sharding rules and the
batch sharded over 'data'. Gradient all-reduce is inserted by XLA (the DDP
equivalent); log-var reduction (reference base.py:124-127) is the jnp.mean
over the sharded batch.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .mesh import batch_sharding, param_sharding, replicated, shard_batch


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, tx):
        params = variables['params']
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get('batch_stats', {}),
                   opt_state=tx.init(params), tx=tx)

    def variables(self):
        v = {'params': self.params}
        if self.batch_stats:
            v['batch_stats'] = self.batch_stats
        return v


def make_lr_schedule(base_lr: float, *, policy: str = 'step',
                     warmup_steps: int = 0,
                     warmup_ratio: float = 1e-3, step_epochs=(),
                     steps_per_epoch: int = 1, gamma: float = 0.1,
                     power: float = 0.9, min_lr: float = 0.0,
                     total_steps: int = 0):
    """Linear warmup + decay policy.

    ``policy='step'`` is the TPS++ recipe (reference
    configs/_base_/schedules/schedule_adam_step_12e.py); ``policy='poly'``
    is the det-family recipe (schedule_sgd_1200e.py: mmcv PolyLrUpdaterHook,
    lr = (base-min)*(1-t/T)^power + min), ``policy='fixed'`` holds base_lr.
    """
    boundaries = {int(e * steps_per_epoch): gamma for e in step_epochs}

    def schedule(count):
        lr = base_lr
        if warmup_steps > 0:
            frac = jnp.minimum(count / warmup_steps, 1.0)
            lr = base_lr * (warmup_ratio + (1 - warmup_ratio) * frac)
        if policy == 'poly' and total_steps > 0:
            frac = jnp.clip(count / total_steps, 0.0, 1.0)
            return (lr - min_lr) * (1.0 - frac) ** power + min_lr
        factor = jnp.ones(())
        for b in sorted(boundaries):
            factor = jnp.where(count >= b, factor * boundaries[b], factor)
        return lr * factor

    return schedule


def _paramwise_lr_mults(custom_keys: Dict[str, Dict], params):
    """mmcv paramwise_cfg.custom_keys analog: per-leaf lr multipliers.

    mmcv matches a custom key as a substring of the torch parameter name
    (mmcv/runner/optimizer/default_constructor.py); here the '/'-joined
    flax path plays that role. Sorted longest-key-first so the most
    specific match wins, like mmcv's sorted(custom_keys)[::-1].
    """
    import flax
    keys = sorted(custom_keys, key=len, reverse=True)
    flat = flax.traverse_util.flatten_dict(params)
    mults = {}
    for path in flat:
        name = '/'.join(str(p) for p in path)
        mult = 1.0
        for k in keys:
            if k in name:
                mult = float(custom_keys[k].get('lr_mult', 1.0))
                break
        mults[path] = mult
    return flax.traverse_util.unflatten_dict(mults)


def build_optimizer(cfg: Dict, steps_per_epoch: int = 1):
    """optax chain from a reference-style optimizer/schedule config."""
    cfg = dict(cfg or {})
    opt_type = cfg.pop('type', 'Adam')
    base_lr = cfg.pop('lr', 1e-4)
    grad_clip = cfg.pop('grad_clip', None)
    sched_cfg = dict(cfg.pop('lr_config', None) or {})
    paramwise = cfg.pop('paramwise_cfg', None)
    # translate torch/mmcv optimizer keys to optax's
    if 'betas' in cfg:
        cfg['b1'], cfg['b2'] = cfg.pop('betas')
    # mmcv warmup keys (schedule_sgd_160e.py: warmup='linear',
    # warmup_iters=500[, warmup_by_epoch=True]) -> warmup_steps
    if sched_cfg.get('warmup') and 'warmup_iters' in sched_cfg:
        it = int(sched_cfg['warmup_iters'])
        sched_cfg.setdefault(
            'warmup_steps',
            it * steps_per_epoch if sched_cfg.get('warmup_by_epoch') else it)
    # torch's coupled weight_decay (L2 added to the gradient BEFORE the
    # moment updates) == chain(add_decayed_weights, opt); optax.adamw's own
    # decoupled decay keeps its kwarg
    l2 = None
    if opt_type.lower() != 'adamw':
        l2 = cfg.pop('weight_decay', None)
    schedule = make_lr_schedule(
        base_lr,
        policy=sched_cfg.get('policy', 'step'),
        warmup_steps=int(sched_cfg.get('warmup_epochs', 0) * steps_per_epoch)
        or sched_cfg.get('warmup_steps', 0),
        warmup_ratio=sched_cfg.get('warmup_ratio', 1e-3),
        step_epochs=sched_cfg.get('step', ()),
        steps_per_epoch=steps_per_epoch,
        gamma=sched_cfg.get('gamma', 0.1),
        power=sched_cfg.get('power', 0.9),
        min_lr=sched_cfg.get('min_lr', 0.0),
        total_steps=int(sched_cfg.get('total_epochs', 0) * steps_per_epoch))
    if opt_type.lower() == 'adam':
        tx = optax.adam(schedule, **cfg)
    elif opt_type.lower() == 'adamw':
        tx = optax.adamw(schedule, **cfg)
    elif opt_type.lower() == 'adadelta':
        tx = optax.adadelta(schedule, **cfg)
    elif opt_type.lower() == 'sgd':
        tx = optax.sgd(schedule, **cfg)
    else:
        raise ValueError(opt_type)
    if l2:
        tx = optax.chain(optax.add_decayed_weights(l2), tx)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(
            grad_clip.get('max_norm', 1.0)), tx)
    if paramwise and paramwise.get('custom_keys'):
        # scale each leaf's UPDATE by its lr_mult — equivalent to mmcv's
        # per-group lr = base_lr * lr_mult for these scale-free updates
        # (schedule_adam_custom_key_step_10e.py freezes backbone/encoder
        # with lr_mult=0.0)
        custom = {k: dict(v) for k, v in paramwise['custom_keys'].items()}
        tx = optax.chain(tx, optax.GradientTransformation(
            lambda params: optax.EmptyState(),
            lambda updates, state, params=None: (jax.tree.map(
                lambda u, m: u * m, updates,
                _paramwise_lr_mults(custom, updates)), state)))
    return tx, schedule


def build_optimizer_from_run_cfg(cfg: Dict, steps_per_epoch: int,
                                 total_epochs: int):
    """Assemble the optimizer from a whole run config's reference-layout
    keys — ``optimizer``, ``lr_config`` (poly/step/warmup live here) and
    ``optimizer_config.grad_clip`` (mmcv keeps clipping in a separate
    OptimizerHook config) — so every trainer (recognizer, det, KIE, NER)
    honors schedules uniformly instead of silently running flat-lr."""
    opt_cfg = dict(cfg.get('optimizer') or dict(type='Adam', lr=1e-4))
    opt_cfg['lr_config'] = dict(cfg.get('lr_config', {}) or {})
    # poly decay spans the whole run
    opt_cfg['lr_config'].setdefault('total_epochs', total_epochs)
    oc = cfg.get('optimizer_config') or {}
    if oc.get('grad_clip') and 'grad_clip' not in opt_cfg:
        opt_cfg['grad_clip'] = dict(oc['grad_clip'])
    return build_optimizer(opt_cfg, steps_per_epoch=steps_per_epoch)


def make_train_step(recognizer, mesh=None, donate: bool = True,
                    remat: str = 'none') -> Callable:
    """Jitted sharded train step over an optional mesh.

    ``remat``: rematerialization policy trading FLOPs for activation
    memory (jax.checkpoint) — 'none' (default), 'dots' (save matmul
    outputs, recompute elementwise: mild recompute, big win on conv/
    attention activations), 'full' (save only the loss inputs: ~2x
    forward FLOPs, minimal memory). Gradients agree across policies up
    to recompute-order rounding — NOT bitwise (tests/test_parallel.py);
    do not switch remat mid-run if exact resume determinism matters.
    """

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            total, (losses, new_state) = recognizer.compute_loss(
                variables, batch, rng, train=True)
            return total, (losses, new_state.get('batch_stats', {}))

        if remat == 'full':
            loss_fn = jax.checkpoint(loss_fn)
        elif remat == 'dots':
            loss_fn = jax.checkpoint(
                loss_fn, policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable)
        elif remat != 'none':
            raise ValueError(f'unknown remat policy {remat!r}')

        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {'loss': loss, **losses,
                   'grad_norm': optax.global_norm(grads)}
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def place_and_step(state, host_batch, rng):
        batch = shard_batch(host_batch, mesh)
        return _jitted(state, batch, rng)

    _jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())
    return place_and_step


def shard_state(state: TrainState, mesh) -> TrainState:
    """Place params per the TP rules and move the EXISTING opt_state onto
    the layout a jitted tx.init produces (XLA propagates the param
    shardings into the moment trees). The existing state is placed — not
    re-initialized — so a resume's restored Adam moments and schedule
    count survive sharding."""
    p_sh = param_sharding(state.params, mesh)
    params = jax.device_put(state.params, p_sh)
    layout = jax.jit(state.tx.init)(params)
    rep_all = replicated(mesh)
    mesh_devs = set(np.asarray(mesh.devices).flat)

    def _sh(x):
        # input-independent leaves (the schedule count scalar) come back
        # single-device from the jitted init; everything on the step's
        # mesh must be mesh-wide
        s = x.sharding
        return s if set(s.device_set) == mesh_devs else rep_all

    shardings = jax.tree.map(_sh, layout)
    del layout
    opt_state = jax.device_put(state.opt_state, shardings)
    rep = replicated(mesh)
    bs = jax.tree.map(lambda x: jax.device_put(x, rep), state.batch_stats)
    return state.replace(params=params, opt_state=opt_state, batch_stats=bs,
                         step=jax.device_put(state.step, rep))
