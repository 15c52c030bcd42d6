"""Detection training loop (the det half of reference ``apis/train.py`` —
the reference drives every task through the same EpochBasedRunner; here
detectors get a jitted optax loop mirroring apis/train.py's recognizer
loop).

Supports the config schema of configs/textdet/*: ``model`` with backbone /
neck / head / loss / targets, data via TextDetDataset JSON lines.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import numpy as np

from ..config import ConfigDict
from ..registry import BACKBONES, HEADS, LOSSES, NECKS, PIPELINES

logger = logging.getLogger(__name__)

DET_TYPES = ('DBNet', 'PANet', 'PSENet', 'FCENet', 'TextSnake',
             'OCRMaskRCNN', 'DRRG')

# per-detector (module class, target keys expected by its loss)
_TARGET_KEYS = {
    'DBNet': ('gt_shrink', 'gt_shrink_mask', 'gt_thr', 'gt_thr_mask'),
    'PANet': ('gt_texts', 'gt_kernels', 'gt_mask'),
    'PSENet': ('gt_kernels', 'gt_mask'),
    'TextSnake': ('gt_text_mask', 'gt_center_region_mask', 'gt_mask',
                  'gt_radius_map', 'gt_sin_map', 'gt_cos_map'),
    'FCENet': ('p3_maps', 'p4_maps', 'p5_maps'),
}


def _build(reg, cfg):
    cfg = dict(cfg)
    return reg.get(cfg.pop('type'))(**cfg)


def build_detector_module(model_cfg: Dict):
    from ..models import textdet as td

    t = model_cfg.get('type', 'DBNet')
    if t == 'DBNet':
        module_cls = td.DBNetModule
    elif t == 'FCENet':
        module_cls = td.FCENetModule
    elif t == 'TextSnake':
        module_cls = td.TextSnakeModule
    else:
        module_cls = td.PANetModule
    return module_cls(backbone=_build(BACKBONES, model_cfg['backbone']),
                      neck=_build(NECKS, model_cfg['neck']),
                      head=_build(HEADS, model_cfg['head']))


def build_det_targets(model_cfg: Dict):
    cfg = dict(model_cfg.get('targets') or
               {'type': f"{model_cfg.get('type', 'DBNet')}Targets"})
    from ..models import textdet  # noqa: F401 — registers target pipelines
    return PIPELINES.get(cfg.pop('type'))(**cfg)


def train_detector(cfg: ConfigDict, train_ds, work_dir: Optional[str] = None,
                   total_epochs: Optional[int] = None,
                   batch_size: int = 4, log_interval: int = 10,
                   seed: int = 0):
    """Epoch loop: host target generation -> jitted loss+grad+adam step."""
    import jax
    import jax.numpy as jnp
    import optax

    model_cfg = cfg['model']
    det_type = model_cfg.get('type', 'DBNet')
    module = build_detector_module(model_cfg)
    loss_cfg = dict(model_cfg.get('loss') or
                    {'type': f'{det_type}Loss'})
    loss_fn = LOSSES.get(loss_cfg.pop('type'))(**loss_cfg)
    targets = build_det_targets(model_cfg)
    keys = _TARGET_KEYS[det_type]

    sample = train_ds[0]
    H, W = sample['img'].shape[:2]
    variables = module.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, H, W, 3), jnp.float32))
    params = variables['params']
    state = {k: v for k, v in variables.items() if k != 'params'}

    opt_cfg = dict(cfg.get('optimizer') or {'type': 'Adam', 'lr': 1e-3})
    lr = opt_cfg.get('lr', 1e-3)
    tx = (optax.sgd(lr, momentum=opt_cfg.get('momentum', 0.9))
          if opt_cfg.get('type') == 'SGD' else optax.adam(lr))
    opt_state = tx.init(params)
    epochs = total_epochs or cfg.get('total_epochs') or 1

    @jax.jit
    def step(params, state, opt_state, img, tgt):
        def f(p):
            out, new_state = module.apply({'params': p, **state}, img,
                                          train=True,
                                          mutable=['batch_stats'])
            losses = loss_fn(out, tgt)
            return sum(jnp.asarray(v) for v in losses.values()), (new_state,
                                                                  losses)
        (loss, (new_state, losses)), grads = jax.value_and_grad(
            f, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss, losses

    # PAN/PSE heads emit 1/4-resolution maps; their losses consume targets
    # at pred resolution (the reference rescales BitmapMasks by
    # downsample_ratio, pan_loss.py:120-123)
    ds_ratio = 0.25 if det_type in ('PANet', 'PSENet') else 1.0

    def _rescale(arr):
        if ds_ratio == 1.0:
            return np.asarray(arr)
        import cv2
        arr = np.asarray(arr)
        size = (int(arr.shape[-1] * ds_ratio), int(arr.shape[-2] * ds_ratio))
        if arr.ndim == 2:
            return cv2.resize(arr, size, interpolation=cv2.INTER_NEAREST)
        return np.stack([cv2.resize(a, size,
                                    interpolation=cv2.INTER_NEAREST)
                         for a in arr])

    def make_batch(indices):
        imgs, tgts = [], {k: [] for k in keys}
        for i in indices:
            item = train_ds[int(i)]
            if keys[0] not in item:
                item = targets(item)
            imgs.append(item['img'])
            for k in keys:
                tgts[k].append(_rescale(item[k]))
        img = jnp.asarray(np.stack(imgs), jnp.float32)
        tgt = {k: jnp.asarray(np.stack(v)) for k, v in tgts.items()}
        return img, tgt

    rng = np.random.default_rng(seed)
    n = len(train_ds)
    history = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        t0 = time.time()
        for it in range(0, n, batch_size):
            idx = order[it:it + batch_size]
            img, tgt = make_batch(idx)
            params, state, opt_state, loss, losses = step(
                params, state, opt_state, img, tgt)
            if (it // batch_size) % log_interval == 0:
                logger.info('epoch %d iter %d loss %.4f', epoch,
                            it // batch_size, float(loss))
        history.append(float(loss))
        logger.info('epoch %d done in %.1fs loss %.4f', epoch,
                    time.time() - t0, history[-1])
        if work_dir:
            from ..utils.checkpoint import save_variables
            os.makedirs(work_dir, exist_ok=True)
            save_variables(os.path.join(work_dir, f'epoch_{epoch + 1}.npz'),
                           {'params': params, **state})
    return {'params': params, **state}, history
