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
    if det_type == 'OCRMaskRCNN':
        return _train_maskrcnn(cfg, train_ds, work_dir, total_epochs,
                               log_interval, seed)
    if det_type == 'DRRG':
        return _train_drrg(cfg, train_ds, work_dir, total_epochs,
                           log_interval, seed)
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

    epochs = total_epochs or cfg.get('total_epochs') or 1
    # route through the shared builder so lr_config (the det recipes are
    # poly decay + warmup, e.g. schedule_sgd_1200e) and
    # optimizer_config.grad_clip apply here exactly as in the recognizer
    # loop — not just a flat-lr sgd/adam
    tx = _make_optimizer(cfg, steps_per_epoch=max(1, len(train_ds) //
                                                  batch_size),
                         total_epochs=epochs)
    opt_state = tx.init(params)

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

    # the jitted PAN aggregation/discrimination is vectorized over a STATIC
    # max_instances axis; instances past it get no embedding supervision —
    # make the cap detectable instead of silent (No-silent-caps rule)
    _warned_cap = [False]
    _max_inst = getattr(loss_fn, 'max_instances', None)

    def make_batch(indices):
        imgs, tgts = [], {k: [] for k in keys}
        for i in indices:
            item = train_ds[int(i)]
            if keys[0] not in item:
                item = targets(item)
            if (_max_inst and not _warned_cap[0] and
                    len(item.get('gt_polygons', ())) > _max_inst):
                logger.warning(
                    'image has %d text instances but the loss supervises '
                    'embeddings for at most max_instances=%d — raise '
                    'model.loss.max_instances', len(item['gt_polygons']),
                    _max_inst)
                _warned_cap[0] = True
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


def _make_optimizer(cfg, steps_per_epoch: int = 1, total_epochs: int = 1):
    from ..parallel import build_optimizer_from_run_cfg
    run_cfg = dict(cfg)
    run_cfg.setdefault('optimizer', {'type': 'Adam', 'lr': 1e-3})
    tx, _ = build_optimizer_from_run_cfg(run_cfg, steps_per_epoch,
                                         total_epochs)
    return tx


def _poly_boxes_masks(polys, h, w):
    """gt polygons -> axis-aligned boxes + instance bitmasks (the mmdet
    gt_bboxes/gt_masks inputs of the reference OCRMaskRCNN train path)."""
    import cv2
    boxes, masks = [], []
    for p in polys:
        pts = np.asarray(p, np.float32).reshape(-1, 2)
        if len(pts) < 3:
            continue
        boxes.append([pts[:, 0].min(), pts[:, 1].min(),
                      pts[:, 0].max(), pts[:, 1].max()])
        m = np.zeros((h, w), np.uint8)
        cv2.fillPoly(m, [pts.astype(np.int32)], 1)
        masks.append(m)
    return np.asarray(boxes, np.float32).reshape(-1, 4), masks


def _train_maskrcnn(cfg, train_ds, work_dir, total_epochs, log_interval,
                    seed):
    """OCRMaskRCNN two-stage training (reference OCRMaskRCNN ==
    mmdet MaskRCNN.forward_train): per image, host-side anchor targets +
    proposal sampling around the current RPN, then one jitted
    rpn+box+mask loss/grad/update step with differentiable RoIAlign."""
    import jax
    import jax.numpy as jnp
    import optax
    from ..models import textdet as td

    model_cfg = cfg['model']

    def _head(cfg_key, cls, **defaults):
        c = dict(model_cfg.get(cfg_key) or {})
        c.pop('type', None)
        return cls(**{**defaults, **c})

    module = td.MaskRCNNModule(
        backbone=_build(BACKBONES, model_cfg['backbone']),
        neck=_build(NECKS, model_cfg['neck']),
        rpn_head=_head('rpn_head', td.RPNHead),
        box_head=_head('box_head', td.BoxHead),
        mask_head=_head('mask_head', td.MaskHead))
    det = td.MaskRCNNDetector(
        module, num_train_rois=model_cfg.get('num_train_rois', 64),
        text_repr_type=model_cfg.get('text_repr_type', 'quad'))

    H, W = train_ds[0]['img'].shape[:2]
    variables = det.init_variables(jax.random.PRNGKey(seed), (1, H, W, 3))
    params = {'main': variables['main']['params'],
              'box': variables['box']['params'],
              'mask': variables['mask']['params']}
    bstats = {k: v for k, v in variables['main'].items() if k != 'params'}
    epochs = total_epochs or cfg.get('total_epochs') or 1
    tx = _make_optimizer(cfg, steps_per_epoch=len(train_ds),
                         total_epochs=epochs)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state, img, batch):
        def f(p):
            v = {'main': {'params': p['main'], **bstats},
                 'box': {'params': p['box']},
                 'mask': {'params': p['mask']}}
            losses, new_state = det.train_losses(v, img, batch)
            return (sum(jnp.asarray(x) for x in losses.values()),
                    (losses, new_state))
        (loss, (losses, new_state)), grads = jax.value_and_grad(
            f, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_state, opt_state,
                loss, losses)

    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(epochs):
        t0 = time.time()
        loss = float('nan')
        for it, i in enumerate(rng.permutation(len(train_ds))):
            item = train_ds[int(i)]
            img_np = np.asarray(item['img'], np.float32)[None]
            gt_boxes, gt_masks = _poly_boxes_masks(
                item.get('gt_polygons', []), *img_np.shape[1:3])
            v = {'main': {'params': params['main'], **bstats},
                 'box': {'params': params['box']},
                 'mask': {'params': params['mask']}}
            batch = det.sample_train_batch(v, img_np, gt_boxes, gt_masks,
                                           rng=rng)
            if batch is None:
                continue
            batch = {k: jnp.asarray(val) for k, val in batch.items()}
            params, new_state, opt_state, loss, losses = step(
                params, bstats, opt_state, jnp.asarray(img_np), batch)
            bstats = new_state if new_state else bstats
            if it % log_interval == 0:
                logger.info('epoch %d iter %d loss %.4f', epoch, it,
                            float(loss))
        history.append(float(loss))
        logger.info('epoch %d done in %.1fs loss %.4f', epoch,
                    time.time() - t0, history[-1])
        if work_dir:
            from ..utils.checkpoint import save_variables
            os.makedirs(work_dir, exist_ok=True)
            save_variables(os.path.join(work_dir, f'epoch_{epoch + 1}.npz'),
                           {'params': params, **bstats})
    return {'params': params, **bstats}, history


def _train_drrg(cfg, train_ds, work_dir, total_epochs, log_interval, seed):
    """DRRG training (reference drrg.py forward_train + drrg_head.py): map
    losses backprop through head/neck/backbone; the GCN trains on node
    features built host-side from the current feature map (our rotated
    RoIAlign is host numpy, so the GCN branch does not push gradients into
    the backbone — the map losses do, as in a stop-gradient'd reference)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax
    from ..models import textdet as td

    model_cfg = cfg['model']
    neck_out = dict(model_cfg['neck']).get('out_channels', 32)

    class _DRRGNet(nn.Module):
        backbone: object
        neck: object
        head: object

        @nn.compact
        def __call__(self, img, train=False):
            feats = self.backbone(img, train=train)
            f = self.neck(feats, train=train)
            return f, self.head(f, train=train)

    net = _DRRGNet(backbone=_build(BACKBONES, model_cfg['backbone']),
                   neck=_build(NECKS, model_cfg['neck']),
                   head=td.DRRGHead(in_channels=neck_out))
    det = td.DRRGDetector(td.DRRGHead(in_channels=neck_out))
    targets = build_det_targets(model_cfg)
    loss_fn = td.DRRGLoss()

    H, W = train_ds[0]['img'].shape[:2]
    net_vars = net.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, H, W, 3), jnp.float32))
    nfl = det.node_feat_len(neck_out)
    gcn_vars = det.gcn.init(jax.random.PRNGKey(seed + 1),
                            jnp.zeros((1, 4, nfl), jnp.float32),
                            jnp.zeros((1, 4, 4), jnp.float32),
                            jnp.zeros((1, 2), jnp.int32))
    params = {'net': net_vars['params'], 'gcn': gcn_vars['params']}
    bstats = {k: v for k, v in net_vars.items() if k != 'params'}
    epochs = total_epochs or cfg.get('total_epochs') or 1
    tx = _make_optimizer(cfg, steps_per_epoch=len(train_ds),
                         total_epochs=epochs)
    opt_state = tx.init(params)

    fwd = jax.jit(lambda p, b, img: net.apply({'params': p, **b}, img))

    @jax.jit
    def step(params, bstats, opt_state, img, tgt, node_feats, adjs, knns,
             links):
        # jitted: graph tensors are padded to (graph, node) BUCKETS by
        # LocalGraphs.pack, so only a handful of shapes ever compile;
        # padded graphs carry link label -1 (ignored by gcn_loss)
        def f(p):
            (_, pred_maps), new_state = net.apply(
                {'params': p['net'], **bstats}, img, train=True,
                mutable=['batch_stats'])
            gcn_pred = det.gcn.apply({'params': p['gcn']}, node_feats,
                                     adjs, knns)
            losses = loss_fn(pred_maps, tgt, gcn_pred, links)
            return (sum(jnp.asarray(x) for x in losses.values()),
                    (losses, new_state))
        (loss, (losses, new_state)), grads = jax.value_and_grad(
            f, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_state, opt_state,
                loss, losses)

    rng = np.random.default_rng(seed)
    history = []
    tgt_keys = ('gt_text_mask', 'gt_center_region_mask', 'gt_mask',
                'gt_top_height_map', 'gt_bot_height_map', 'gt_sin_map',
                'gt_cos_map')
    for epoch in range(epochs):
        t0 = time.time()
        loss = float('nan')
        for it, i in enumerate(rng.permutation(len(train_ds))):
            item = train_ds[int(i)]
            if 'gt_comp_attribs' not in item:
                item = targets(item)
            img = jnp.asarray(np.asarray(item['img'], np.float32)[None])
            tgt = {k: jnp.asarray(np.asarray(item[k]))[None]
                   for k in tgt_keys}
            feats, pred_maps = fwd(params['net'], bstats, img)
            feat_cat = np.concatenate([np.asarray(feats),
                                       np.asarray(pred_maps)], axis=-1)
            # bucketed graph padding: nodes to the k-hop theoretical max,
            # graphs to the next power-of-two bucket, so the jitted step
            # compiles once per bucket instead of once per image
            g = det.graph_train
            pad_nodes = 1 + g.k_at_hops[0] * (1 + g.k_at_hops[1])
            f, a, k, links, graphs, _ = det.graph_train.build(
                feat_cat[0], np.asarray(item['gt_comp_attribs']),
                pad_nodes=pad_nodes,
                pad_graphs=max(8, 1 << (len(
                    item['gt_comp_attribs']) - 1).bit_length()))
            params, new_state, opt_state, loss, losses = step(
                params, bstats, opt_state, img, tgt, jnp.asarray(f),
                jnp.asarray(a), jnp.asarray(k), jnp.asarray(links))
            bstats = new_state if new_state else bstats
            if it % log_interval == 0:
                logger.info('epoch %d iter %d loss %.4f', epoch, it,
                            float(loss))
        history.append(float(loss))
        logger.info('epoch %d done in %.1fs loss %.4f', epoch,
                    time.time() - t0, history[-1])
        if work_dir:
            from ..utils.checkpoint import save_variables
            os.makedirs(work_dir, exist_ok=True)
            save_variables(os.path.join(work_dir, f'epoch_{epoch + 1}.npz'),
                           {'params': params, **bstats})
    return {'params': params, **bstats}, history
