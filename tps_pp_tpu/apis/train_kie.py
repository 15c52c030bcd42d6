"""KIE (SDMGR) and NER (BERT-softmax) training loops.

The reference trains both through the same ``tools/train.py`` CLI:
SDMGR via ``kie/extractors/sdmgr.py:16`` (forward_train -> SDMGRHead +
SDMGRLoss) and NER via ``ner/classifiers/ner_classifier.py:8``
(forward_train -> BertEncoder + FCDecoder + MaskedCrossEntropyLoss).

Both are static-shape friendly on TPU: KIEDataset already pads every graph
to (max_nodes, max_chars) with node/edge ignore labels, so a batch is one
dense (B, N, ...) tensor stack vmapped through the head; NER is fixed
``max_len`` token sequences. One jitted loss+grad+adam step each.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import numpy as np

from ..config import ConfigDict
from ..utils.platform import training_rng
from ..registry import ENCODERS, HEADS, LOSSES

logger = logging.getLogger(__name__)

KIE_TYPES = ('SDMGR',)
NER_TYPES = ('NerClassifier',)


def _build(reg, cfg):
    cfg = dict(cfg)
    return reg.get(cfg.pop('type'))(**cfg)


def roi_visual_pool(fm, boxes):
    """(H, W, C) feature map + (N, 4) boxes -> (N, C) pooled visual
    features (reference extractor + maxpool, sdmgr.py:96-100). The ONE
    definition shared by training and inference — a drifting copy would
    silently diverge the visual modality between the two."""
    import jax.numpy as jnp

    from ..models.textdet import roi_align_jax
    return jnp.max(roi_align_jax(fm, boxes, (7, 7)), axis=(1, 2))


def _epoch_loop(n, batch_size, epochs, seed, make_batch, run_step, save):
    # a dataset smaller than batch_size must still train (previously zero
    # steps ran, every epoch logged loss=nan and checkpoints held the
    # random init); short tails pad by repeating indices
    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        t0 = time.time()
        loss = float('nan')
        for it in range(0, n, batch_size):
            idx = order[it:it + batch_size]
            if len(idx) < batch_size:
                reps = -(-batch_size // max(n, 1))   # n may be < batch_size
                idx = np.concatenate([idx] + [order] * reps)[:batch_size]
            loss = run_step(make_batch(idx), epoch, it)
        history.append(float(loss))
        logger.info('epoch %d done in %.1fs loss %.4f', epoch,
                    time.time() - t0, history[-1])
        save(epoch)
    return history


def train_kie(cfg: ConfigDict, train_ds, work_dir: Optional[str] = None,
              total_epochs: Optional[int] = None, batch_size: int = 4,
              log_interval: int = 10, seed: int = 0):
    """SDMGR training (reference sdmgr.py forward_train + sdmgr_loss.py).

    With ``visual_modality=True`` + a UNet backbone in the model config
    (and a dataset built with ``with_visual=True``), node features fuse
    RoI-pooled visual features like the reference extract_feat
    (sdmgr.py:96-100: UNet last level -> RoIAlign 7x7 -> maxpool ->
    BlockFusion in the head); otherwise the text+spatial modality alone
    (the reference model-class default)."""
    import jax
    import jax.numpy as jnp
    import optax
    from .train_det import _make_optimizer
    from .. import models as _models  # noqa: F401 (registration)
    from ..registry import BACKBONES

    model_cfg = cfg['model']
    head = _build(HEADS, model_cfg['head'])
    loss_cfg = dict(model_cfg.get('loss') or {'type': 'SDMGRLoss'})
    loss_obj = LOSSES.get(loss_cfg.pop('type'))(**loss_cfg)

    sample = train_ds[0]
    visual = bool(model_cfg.get('visual_modality')) and 'img' in sample
    unet = None
    if visual:
        unet = _build(BACKBONES, model_cfg.get('backbone') or
                      {'type': 'UNet', 'base_channels': 16})

    roi_visual = roi_visual_pool

    rng0 = jax.random.PRNGKey(seed)
    if visual:
        img0 = jnp.asarray(sample['img'])[None]
        unet_vars = unet.init(rng0, img0)
        fm0 = unet.apply(unet_vars, img0)
        vis0 = roi_visual(fm0[0], jnp.asarray(sample['boxes']))
        head_vars = head.init(rng0, jnp.asarray(sample['relations']),
                              jnp.asarray(sample['texts']), vis0)
        params = {'head': head_vars['params'],
                  'unet': unet_vars['params']}
        bstats = {k: v for k, v in unet_vars.items() if k != 'params'}
    else:
        head_vars = head.init(rng0, jnp.asarray(sample['relations']),
                              jnp.asarray(sample['texts']))
        params = {'head': head_vars['params']}
        bstats = {}
    epochs = total_epochs or cfg.get('total_epochs') or 1
    tx = _make_optimizer(cfg, steps_per_epoch=len(train_ds),
                         total_epochs=epochs)
    opt_state = tx.init(params)
    num_classes = head.num_classes

    @jax.jit
    def step(params, bstats, opt_state, relations, texts, labels,
             edge_labels, img=None, boxes=None):
        def f(p):
            new_state = bstats
            if visual:
                fm, new_state = unet.apply(
                    {'params': p['unet'], **bstats}, img, train=True,
                    mutable=['batch_stats'])
                node_cls, edge_cls = jax.vmap(
                    lambda f_, b_, r, t: head.apply(
                        {'params': p['head']}, r, t, roi_visual(f_, b_))
                )(fm, boxes, relations, texts)
            else:
                node_cls, edge_cls = jax.vmap(
                    lambda r, t: head.apply({'params': p['head']}, r, t)
                )(relations, texts)
            losses = loss_obj(node_cls.reshape(-1, num_classes),
                              edge_cls.reshape(-1, 2),
                              labels.reshape(-1),
                              edge_labels.reshape(edge_labels.shape[0], -1))
            return (sum(jnp.asarray(v) for v in losses.values()),
                    (losses, new_state))
        (loss, (losses, new_state)), grads = jax.value_and_grad(
            f, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss, losses

    def make_batch(indices):
        items = [train_ds[int(i)] for i in indices]
        keys = ['relations', 'texts', 'labels', 'edge_labels']
        if visual:
            keys += ['img', 'boxes']
        return tuple(jnp.asarray(np.stack([it[k] for it in items]))
                     for k in keys)

    state = {'params': params, 'bstats': bstats, 'opt_state': opt_state}

    def run_step(batch, epoch, it):
        (state['params'], new_state, state['opt_state'], loss,
         _) = step(state['params'], state['bstats'], state['opt_state'],
                   *batch)
        if new_state:
            state['bstats'] = new_state
        if (it // batch_size) % log_interval == 0:
            logger.info('epoch %d iter %d loss %.4f', epoch,
                        it // batch_size, float(loss))
        return loss

    def save(epoch):
        if work_dir:
            from ..utils.checkpoint import save_variables
            os.makedirs(work_dir, exist_ok=True)
            save_variables(os.path.join(work_dir, f'epoch_{epoch + 1}.npz'),
                           {'params': state['params'], **state['bstats']})

    history = _epoch_loop(len(train_ds), batch_size, epochs, seed,
                          make_batch, run_step, save)
    return {'params': state['params'], **state['bstats']}, history


def train_ner(cfg: ConfigDict, train_ds, work_dir: Optional[str] = None,
              total_epochs: Optional[int] = None, batch_size: int = 8,
              log_interval: int = 10, seed: int = 0):
    """NER training (reference ner_classifier.py forward_train)."""
    import jax
    import jax.numpy as jnp
    import optax
    from .train_det import _make_optimizer
    from ..models.ner.bert import NerClassifierModule
    from .. import models as _models  # noqa: F401 (registration)

    model_cfg = cfg['model']
    module = NerClassifierModule(
        encoder=_build(ENCODERS, model_cfg['encoder']),
        decoder=_build(HEADS, model_cfg['decoder']))
    loss_cfg = dict(model_cfg.get('loss') or
                    {'type': 'MaskedCrossEntropyLoss'})
    loss_obj = LOSSES.get(loss_cfg.pop('type'))(**loss_cfg)

    sample = train_ds[0]
    T = sample['input_ids'].shape[0]
    variables = module.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, T), jnp.int32))
    params = variables['params']
    epochs = total_epochs or cfg.get('total_epochs') or 1
    tx = _make_optimizer(cfg, steps_per_epoch=max(1, len(train_ds) //
                                                  batch_size),
                         total_epochs=epochs)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng, input_ids, attention_mask, labels):
        def f(p):
            logits = module.apply({'params': p}, input_ids, attention_mask,
                                  train=True, rngs={'dropout': rng})
            losses = loss_obj(logits, labels, attention_mask)
            return sum(jnp.asarray(v) for v in losses.values()), losses
        (loss, losses), grads = jax.value_and_grad(f, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, losses

    def make_batch(indices):
        items = [train_ds[int(i)] for i in indices]
        return tuple(jnp.asarray(np.stack([it[k] for it in items]))
                     for k in ('input_ids', 'attention_mask', 'labels'))

    base_rng = training_rng(seed, str(cfg.get('rng_impl', 'auto')))
    state = {'params': params, 'opt_state': opt_state, 'it': 0}

    def run_step(batch, epoch, it):
        rng = jax.random.fold_in(base_rng, state['it'])
        state['it'] += 1
        state['params'], state['opt_state'], loss, _ = step(
            state['params'], state['opt_state'], rng, *batch)
        if (it // batch_size) % log_interval == 0:
            logger.info('epoch %d iter %d loss %.4f', epoch,
                        it // batch_size, float(loss))
        return loss

    def save(epoch):
        if work_dir:
            from ..utils.checkpoint import save_variables
            os.makedirs(work_dir, exist_ok=True)
            save_variables(os.path.join(work_dir, f'epoch_{epoch + 1}.npz'),
                           {'params': state['params']})

    history = _epoch_loop(len(train_ds), batch_size, epochs, seed,
                          make_batch, run_step, save)
    return {'params': state['params']}, history


def build_sdmgr_apply(cfg: ConfigDict, checkpoint: Optional[str],
                      sample: dict):
    """Build SDMGR inference: returns ``(apply, variables, visual)`` where
    ``apply(variables, item) -> (node_cls, edge_cls)``. Mirrors
    ``train_kie``'s checkpoint structure (incl. the UNet visual modality,
    reference ``kie/extractors/sdmgr.py:24-57``); shared by the eval CLI
    and ``tools/kie_test_imgs.py``."""
    import jax
    import jax.numpy as jnp

    from ..registry import BACKBONES, HEADS
    from ..utils.checkpoint import load_variables

    model_cfg = cfg['model']
    head = _build(HEADS, model_cfg['head'])
    rng0 = jax.random.PRNGKey(0)
    visual = bool(model_cfg.get('visual_modality')) and 'img' in sample
    if visual:
        from ..models.textdet import roi_align_jax
        unet = _build(BACKBONES, model_cfg.get('backbone') or
                      {'type': 'UNet', 'base_channels': 16})
        unet_vars = unet.init(rng0, jnp.asarray(sample['img'])[None])
        fm0 = unet.apply(unet_vars, jnp.asarray(sample['img'])[None])
        vis0 = roi_visual_pool(fm0[0], jnp.asarray(sample['boxes']))
        head_vars = head.init(rng0, jnp.asarray(sample['relations']),
                              jnp.asarray(sample['texts']), vis0)
        variables = {'params': {'head': head_vars['params'],
                                'unet': unet_vars['params']},
                     **{k: v for k, v in unet_vars.items()
                        if k != 'params'}}

        @jax.jit
        def _apply(v, r, t, img, boxes):
            bs = {k: vv for k, vv in v.items() if k != 'params'}
            fm = unet.apply({'params': v['params']['unet'], **bs}, img)
            vis = roi_visual_pool(fm[0], boxes)
            return head.apply({'params': v['params']['head']}, r, t, vis)

        def apply(v, item):
            return _apply(v, jnp.asarray(item['relations']),
                          jnp.asarray(item['texts']),
                          jnp.asarray(item['img'])[None],
                          jnp.asarray(item['boxes']))
    else:
        head_vars = head.init(rng0, jnp.asarray(sample['relations']),
                              jnp.asarray(sample['texts']))
        variables = {'params': {'head': head_vars['params']}}
        _apply = jax.jit(lambda v, r, t: head.apply(
            {'params': v['params']['head']}, r, t))

        def apply(v, item):
            return _apply(v, jnp.asarray(item['relations']),
                          jnp.asarray(item['texts']))
    if checkpoint:
        variables = load_variables(checkpoint, variables)
    return apply, variables, visual


def build_task_dataset(cfg: ConfigDict, split: str = 'train'):
    """KIE/NER dataset from the config's data section (type-dispatched)."""
    from ..datasets.kie_dataset import (KIEDataset, NerDataset,
                                        OpensetKIEDataset)
    d = dict(cfg['data'][split])
    t = d.pop('type', 'KIEDataset')
    cls = {'KIEDataset': KIEDataset, 'OpensetKIEDataset': OpensetKIEDataset,
           'NerDataset': NerDataset}[t]
    d.pop('pipeline', None)
    d.pop('loader', None)
    return cls(**d)
