"""OCRMaskRCNN — two-stage instance-mask text detector
(SURVEY §2.8 row 75; the reference subclasses mmdet's MaskRCNN,
``textdet/detectors/ocr_mask_rcnn.py:9-70``, with the OCR anchor recipe of
``configs/_base_/det_models/ocr_mask_rcnn_r50_fpn_ohem.py``: single scale 4,
text-shaped ratios, class-agnostic single text class).

TPU-native split:
  * device (flax): backbone -> FPN (5 levels incl. an extra stride-64 pool)
    -> shared RPNHead (objectness + deltas per anchor), and the RoI box /
    mask heads over a FIXED number of RoIs (static shapes; padding RoIs are
    masked out of losses) — all MXU work.
  * host (numpy): anchor generation (deterministic), proposal NMS, train-
    time anchor/RoI assignment and sampling, RoIAlign (axis-aligned variant
    of drrg.roi_align_rotated_np), and seg2boundary
    (reference core/mask.py:54-77).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import HEADS
from ..layers import max_pool
from .drrg import roi_align_rotated_np
from .postprocess import points2boundary


# ----------------------------------------------------------------- anchors --

def generate_anchors(feat_shapes: Sequence[Tuple[int, int]],
                     strides=(4, 8, 16, 32, 64), scales=(4,),
                     ratios=(0.17, 0.44, 1.13, 2.90, 7.46)) -> List[np.ndarray]:
    """Per-level (H*W*A, 4) xyxy anchors (the reference's AnchorGenerator
    recipe)."""
    out = []
    for (h, w), stride in zip(feat_shapes, strides):
        base = []
        for scale in scales:
            size = scale * stride
            for r in ratios:
                aw = size / np.sqrt(r)
                ah = size * np.sqrt(r)
                base.append([-aw / 2, -ah / 2, aw / 2, ah / 2])
        base = np.asarray(base, np.float32)              # (A, 4)
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
        centers = np.stack([xs, ys, xs, ys], -1).reshape(-1, 1, 4) * stride \
            + stride / 2
        out.append((centers + base[None]).reshape(-1, 4).astype(np.float32))
    return out


def delta2bbox(anchors: np.ndarray, deltas: np.ndarray,
               stds=(1., 1., 1., 1.)) -> np.ndarray:
    """DeltaXYWHBBoxCoder decode."""
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + w / 2
    cy = anchors[:, 1] + h / 2
    dx, dy, dw, dh = (deltas[:, i] * stds[i] for i in range(4))
    dw = np.clip(dw, -4.0, 4.0)
    dh = np.clip(dh, -4.0, 4.0)
    ncx, ncy = cx + dx * w, cy + dy * h
    nw, nh = w * np.exp(dw), h * np.exp(dh)
    return np.stack([ncx - nw / 2, ncy - nh / 2,
                     ncx + nw / 2, ncy + nh / 2], -1)


def bbox2delta(anchors: np.ndarray, gts: np.ndarray,
               stds=(1., 1., 1., 1.)) -> np.ndarray:
    w = np.maximum(anchors[:, 2] - anchors[:, 0], 1e-3)
    h = np.maximum(anchors[:, 3] - anchors[:, 1], 1e-3)
    cx = anchors[:, 0] + w / 2
    cy = anchors[:, 1] + h / 2
    gw = np.maximum(gts[:, 2] - gts[:, 0], 1e-3)
    gh = np.maximum(gts[:, 3] - gts[:, 1], 1e-3)
    gcx = gts[:, 0] + gw / 2
    gcy = gts[:, 1] + gh / 2
    d = np.stack([(gcx - cx) / w, (gcy - cy) / h,
                  np.log(gw / w), np.log(gh / h)], -1)
    return d / np.asarray(stds, np.float32)


def bbox_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), -1)
    area_a = np.prod(a[:, 2:] - a[:, :2], -1)
    area_b = np.prod(b[:, 2:] - b[:, :2], -1)
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-6)


def nms_xyxy(boxes: np.ndarray, scores: np.ndarray, thr: float,
             max_out: int) -> np.ndarray:
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0 and len(keep) < max_out:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        ious = bbox_iou_matrix(boxes[i:i + 1], boxes[order[1:]])[0]
        order = order[1:][ious <= thr]
    return np.asarray(keep, np.int64)


# ------------------------------------------------------------------ device --

@HEADS.register_module()
class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness/delta 1x1s applied per level
    (mmdet RPNHead)."""
    feat_channels: int = 256
    num_anchors: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        conv = nn.Conv(self.feat_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name='rpn_conv')
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name='rpn_cls')
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name='rpn_reg')
        outs = []
        for f in feats:
            x = nn.relu(conv(f))
            outs.append((cls(x), reg(x)))
        return tuple(outs)


class BoxHead(nn.Module):
    """Shared2FCBBoxHead: flatten 7x7 RoI -> 2 FCs -> cls(2) + deltas(4)."""
    fc_out: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois, train: bool = False):
        n = rois.shape[0]
        x = rois.reshape(n, -1)
        x = nn.relu(nn.Dense(self.fc_out, dtype=self.dtype, name='fc1')(x))
        x = nn.relu(nn.Dense(self.fc_out, dtype=self.dtype, name='fc2')(x))
        cls = nn.Dense(2, dtype=self.dtype, name='cls')(x)    # bg / text
        deltas = nn.Dense(4, dtype=self.dtype, name='reg')(x)
        return cls, deltas


class MaskHead(nn.Module):
    """FCNMaskHead: 4 convs + deconv x2 + 1x1 -> (n, 28, 28, 1) logits."""
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois, train: bool = False):
        x = rois
        for i in range(4):
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                padding=((1, 1), (1, 1)), dtype=self.dtype,
                                name=f'conv{i}')(x))
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name='up')(x))
        return nn.Conv(1, (1, 1), dtype=self.dtype, name='logits')(x)


class MaskRCNNModule(nn.Module):
    """backbone -> FPN(+stride-64 pool) -> RPN; plus the RoI heads exposed
    as methods over externally pooled RoI features (the pooling itself is
    host-side)."""
    backbone: nn.Module
    neck: nn.Module
    rpn_head: nn.Module
    box_head: nn.Module
    mask_head: nn.Module

    def features(self, img, train: bool = False):
        feats = self.backbone(img, train=train)
        levels = list(self.neck(feats, train=train))
        levels.append(max_pool(levels[-1], 1, 2))   # stride-64 level
        return tuple(levels)

    def __call__(self, img, train: bool = False):
        levels = self.features(img, train=train)
        return levels, self.rpn_head(levels, train=train)

    def run_box_head(self, rois, train: bool = False):
        return self.box_head(rois, train=train)

    def run_mask_head(self, rois, train: bool = False):
        return self.mask_head(rois, train=train)


# ------------------------------------------------------------ orchestrator --

def roi_align_np(feat, boxes, out_size):
    """Axis-aligned RoIAlign over one level's (H, W, C) map; boxes xyxy in
    feature coordinates."""
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    w = np.maximum(boxes[:, 2] - boxes[:, 0], 1.0)
    h = np.maximum(boxes[:, 3] - boxes[:, 1], 1.0)
    rois = np.stack([cx, cy, w, h, np.zeros_like(cx)], -1)
    return roi_align_rotated_np(feat, rois, out_size)


def roi_align_jax(feat, boxes, out_size):
    """Differentiable twin of :func:`roi_align_np` (bin-center bilinear
    sampling, sampling_ratio=1) so second-stage losses backprop into the
    FPN, matching torch mmcv.ops.roi_align in the reference train path.

    feat: (H, W, C); boxes: (N, 4) xyxy in feature coords ->
    (N, out_h, out_w, C)."""
    import jax.numpy as jnp
    out_w, out_h = out_size
    H, W = feat.shape[0], feat.shape[1]
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1.0)
    gys = (jnp.arange(out_h) + 0.5) / out_h - 0.5
    gxs = (jnp.arange(out_w) + 0.5) / out_w - 0.5
    gy, gx = jnp.meshgrid(gys, gxs, indexing='ij')          # (oh, ow)
    px = cx[:, None, None] + gx[None] * w[:, None, None]    # (N, oh, ow)
    py = cy[:, None, None] + gy[None] * h[:, None, None]
    x0 = jnp.clip(jnp.floor(px), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(py), 0, H - 1).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(px - x0, 0, 1)[..., None]
    wy = jnp.clip(py - y0, 0, 1)[..., None]
    return ((feat[y0, x0] * (1 - wx) + feat[y0, x1] * wx) * (1 - wy) +
            (feat[y1, x0] * (1 - wx) + feat[y1, x1] * wx) * wy)


class MaskRCNNDetector:
    """Host orchestration: proposals, RoI pooling, boundary extraction
    (reference OCRMaskRCNN.simple_test + get_boundary)."""

    def __init__(self, module: MaskRCNNModule, strides=(4, 8, 16, 32, 64),
                 pre_nms_top_n=1000, post_nms_top_n=100, rpn_nms_thr=0.7,
                 score_thr=0.5, mask_thr=0.5, text_repr_type='quad',
                 num_train_rois=64):
        self.module = module
        self.strides = strides
        self.pre_nms_top_n = pre_nms_top_n
        self.post_nms_top_n = post_nms_top_n
        self.rpn_nms_thr = rpn_nms_thr
        self.score_thr = score_thr
        self.mask_thr = mask_thr
        self.text_repr_type = text_repr_type
        self.num_train_rois = num_train_rois

    def init_variables(self, rng, img_shape):
        img = jnp.zeros(img_shape, jnp.float32)
        variables = self.module.init(rng, img)
        levels, _ = self.module.apply(variables, img)
        c = levels[0].shape[-1]
        r7 = jnp.zeros((1, 7, 7, c), jnp.float32)
        r14 = jnp.zeros((1, 14, 14, c), jnp.float32)
        v_box = self.module.box_head.init(rng, r7)
        v_mask = self.module.mask_head.init(rng, r14)
        return {'main': variables, 'box': v_box, 'mask': v_mask}

    def _proposals(self, levels_np, rpn_outs_np, img_hw):
        """RPN maps -> NMS'd proposal boxes (n, 4) in image coords."""
        H, W = img_hw
        feat_shapes = [lv.shape[1:3] for lv in levels_np]
        anchors = generate_anchors(feat_shapes, self.strides)
        boxes_all, scores_all = [], []
        for (cls_map, reg_map), anc in zip(rpn_outs_np, anchors):
            scores = 1 / (1 + np.exp(-cls_map.reshape(-1)))
            deltas = reg_map.reshape(-1, 4)
            k = min(self.pre_nms_top_n, len(scores))
            top = np.argpartition(-scores, k - 1)[:k]
            boxes = delta2bbox(anc[top], deltas[top])
            boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, W)
            boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, H)
            boxes_all.append(boxes)
            scores_all.append(scores[top])
        boxes = np.concatenate(boxes_all)
        scores = np.concatenate(scores_all)
        wh = boxes[:, 2:] - boxes[:, :2]
        valid = (wh > 2).all(-1)
        boxes, scores = boxes[valid], scores[valid]
        if len(boxes) == 0:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)
        keep = nms_xyxy(boxes, scores, self.rpn_nms_thr, self.post_nms_top_n)
        return boxes[keep], scores[keep]

    def _pool(self, levels_np, boxes, out_size):
        """FPN level assignment + per-level RoIAlign (SingleRoIExtractor)."""
        if len(boxes) == 0:
            c = levels_np[0].shape[-1]
            return np.zeros((0, out_size[1], out_size[0], c), np.float32)
        areas = np.prod(np.maximum(boxes[:, 2:] - boxes[:, :2], 1), -1)
        lvl = np.clip(np.floor(np.log2(np.sqrt(areas) / 56 + 1e-6)) + 2,
                      0, len(levels_np) - 2).astype(int)
        out = np.zeros((len(boxes), out_size[1], out_size[0],
                        levels_np[0].shape[-1]), np.float32)
        for li in np.unique(lvl):
            sel = lvl == li
            fb = boxes[sel] / self.strides[li]
            out[sel] = roi_align_np(levels_np[li][0], fb, out_size)
        return out

    def detect(self, variables, img) -> List[np.ndarray]:
        """img: (1, H, W, 3). Returns text boundaries [poly..., score]."""
        levels, rpn_outs = self.module.apply(variables['main'], img)
        levels_np = [np.asarray(lv) for lv in levels]
        rpn_np = [(np.asarray(c)[0], np.asarray(r)[0]) for c, r in rpn_outs]
        H, W = img.shape[1:3]
        proposals, _ = self._proposals(levels_np, rpn_np, (H, W))
        if len(proposals) == 0:
            return []
        rois7 = self._pool(levels_np, proposals, (7, 7))
        cls, deltas = self.module.box_head.apply(variables['box'],
                                                 jnp.asarray(rois7))
        cls = np.asarray(jax.nn.softmax(cls, -1))
        deltas = np.asarray(deltas)
        scores = cls[:, 1]
        keep = scores > self.score_thr
        if not keep.any():
            return []
        boxes = delta2bbox(proposals[keep], deltas[keep],
                           stds=(0.1, 0.1, 0.2, 0.2))
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, W)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, H)
        scores = scores[keep]
        k2 = nms_xyxy(boxes, scores, 0.5, self.post_nms_top_n)
        boxes, scores = boxes[k2], scores[k2]
        rois14 = self._pool(levels_np, boxes, (14, 14))
        mask_logits = np.asarray(self.module.mask_head.apply(
            variables['mask'], jnp.asarray(rois14)))[..., 0]
        boundaries = []
        for box, score, mlog in zip(boxes, scores, mask_logits):
            x0, y0, x1, y1 = box.astype(int)
            bw, bh = max(x1 - x0, 1), max(y1 - y0, 1)
            m = cv2.resize(1 / (1 + np.exp(-mlog)), (bw, bh))
            seg = np.zeros((img.shape[1], img.shape[2]), np.uint8)
            seg[y0:y0 + bh, x0:x0 + bw] = (m > self.mask_thr).astype(np.uint8)
            pts = np.argwhere(seg)[:, ::-1]
            if len(pts) == 0:
                continue
            # seg2boundary (reference core/mask.py:54-77)
            b = points2boundary(pts, self.text_repr_type, float(score))
            if b is not None:
                boundaries.append(b)
        return boundaries

    # ------------------------------------------------------------- training
    def rpn_targets(self, feat_shapes, gt_boxes, img_hw,
                    pos_thr=0.7, neg_thr=0.3):
        """Anchor assignment for the RPN loss: (labels (M,), deltas (M, 4))
        with label 1=pos, 0=neg, -1=ignore."""
        anchors = np.concatenate(generate_anchors(feat_shapes, self.strides))
        labels = np.full((len(anchors),), -1, np.int32)
        deltas = np.zeros((len(anchors), 4), np.float32)
        if len(gt_boxes):
            iou = bbox_iou_matrix(anchors, np.asarray(gt_boxes, np.float32))
            best = iou.max(1)
            arg = iou.argmax(1)
            labels[best < neg_thr] = 0
            labels[best >= pos_thr] = 1
            labels[iou.argmax(0)] = 1          # each gt's best anchor
            pos = labels == 1
            deltas[pos] = bbox2delta(anchors[pos],
                                     np.asarray(gt_boxes)[arg[pos]])
        else:
            labels[:] = 0
        return labels, deltas

    def sample_train_batch(self, variables, img_np, gt_boxes, gt_masks,
                           rng=None):
        """Host half of a train step (mmdet two-stage training protocol):
        anchor targets, proposals from the CURRENT rpn, RoI sampling, FPN
        level assignment and mask targets. Returns a dict of fixed-shape
        numpy arrays for :meth:`train_losses`, or None if the image yields
        no candidates."""
        levels, rpn_outs = self.module.apply(variables['main'],
                                             jnp.asarray(img_np))
        levels_np = [np.asarray(lv) for lv in levels]
        feat_shapes = [lv.shape[1:3] for lv in levels_np]
        H, W = img_np.shape[1:3]
        rpn_labels, rpn_deltas = self.rpn_targets(feat_shapes, gt_boxes,
                                                  (H, W))
        rpn_np = [(np.asarray(c)[0], np.asarray(r)[0]) for c, r in rpn_outs]
        proposals, _ = self._proposals(levels_np, rpn_np, (H, W))
        sampled = _sample_rois(proposals, gt_boxes,
                               num=self.num_train_rois, rng=rng)
        if sampled is None:
            return None
        rois, labels, deltas, midx = sampled
        mask_targets = make_mask_targets(
            rois, gt_masks, np.where(labels == 1, midx, -1), out_size=28)
        areas = np.prod(np.maximum(rois[:, 2:] - rois[:, :2], 1), -1)
        lvl = np.clip(np.floor(np.log2(np.sqrt(areas) / 56 + 1e-6)) + 2,
                      0, len(levels_np) - 2).astype(int)
        onehot = np.eye(len(levels_np) - 1, dtype=np.float32)[lvl]
        return dict(rpn_labels=rpn_labels, rpn_deltas=rpn_deltas,
                    rois=rois.astype(np.float32), lvl_onehot=onehot,
                    labels=labels, deltas=deltas, mask_targets=mask_targets)

    def train_losses(self, variables, img, batch):
        """Device half of a train step: rpn + box + mask losses, fully
        differentiable (jit this; RoI pooling uses roi_align_jax so
        gradients reach the FPN and backbone). Returns (losses dict,
        updated batch_stats collection)."""
        (levels, rpn_outs), new_state = self.module.apply(
            variables['main'], img, train=True, mutable=['batch_stats'])
        losses = dict(self.rpn_loss(rpn_outs, batch['rpn_labels'],
                                    batch['rpn_deltas']))
        rois = batch['rois']
        oh = batch['lvl_onehot']                                # (N, L)

        def pool(size):
            return sum(oh[:, li, None, None, None] *
                       roi_align_jax(levels[li][0],
                                     rois / self.strides[li], size)
                       for li in range(oh.shape[1]))

        cls, pred_deltas = self.module.box_head.apply(variables['box'],
                                                      pool((7, 7)))
        mask_logits = self.module.mask_head.apply(variables['mask'],
                                                  pool((14, 14)))
        losses.update(roi_head_losses(cls, pred_deltas, mask_logits,
                                      batch['labels'], batch['deltas'],
                                      batch['mask_targets']))
        return losses, new_state

    def rpn_loss(self, rpn_outs, labels, deltas):
        cls = jnp.concatenate([c.reshape(-1) for c, _ in rpn_outs])
        reg = jnp.concatenate([r.reshape(-1, 4) for _, r in rpn_outs])
        labels = jnp.asarray(labels)
        deltas = jnp.asarray(deltas)
        valid = (labels >= 0).astype(jnp.float32)
        pos = (labels == 1).astype(jnp.float32)
        p = jax.nn.log_sigmoid(cls)
        n = jax.nn.log_sigmoid(-cls)
        bce = -(pos * p + (1 - pos) * n) * valid
        loss_cls = jnp.sum(bce) / jnp.maximum(jnp.sum(valid), 1.0)
        l1 = jnp.abs(reg - deltas).sum(-1) * pos
        loss_box = jnp.sum(l1) / jnp.maximum(jnp.sum(pos), 1.0)
        return {'loss_rpn_cls': loss_cls, 'loss_rpn_bbox': loss_box}


def _sample_rois(proposals, gt_boxes, num=64, pos_fraction=0.25,
                 pos_thr=0.5, rng=None):
    """RoI sampling for the second stage (mmdet RandomSampler semantics):
    returns (rois (num, 4), labels (num,), target_deltas (num, 4),
    matched_gt_idx (num,)); rois are padded by repetition."""
    rng = rng or np.random.default_rng(0)
    gt_boxes = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
    cand = np.concatenate([proposals, gt_boxes], axis=0) \
        if len(gt_boxes) else proposals
    if len(cand) == 0:
        return None
    if len(gt_boxes):
        iou = bbox_iou_matrix(cand, gt_boxes)
        best, arg = iou.max(1), iou.argmax(1)
    else:
        best = np.zeros(len(cand))
        arg = np.zeros(len(cand), np.int64)
    pos_inds = np.nonzero(best >= pos_thr)[0]
    neg_inds = np.nonzero(best < pos_thr)[0]
    n_pos = min(len(pos_inds), int(num * pos_fraction))
    pos_pick = rng.choice(pos_inds, n_pos, replace=False) if n_pos else \
        np.zeros(0, np.int64)
    n_neg = num - n_pos
    neg_pick = (rng.choice(neg_inds, n_neg,
                           replace=len(neg_inds) < n_neg)
                if len(neg_inds) else
                np.repeat(pos_pick[:1] if n_pos else np.zeros(1, np.int64),
                          n_neg))
    pick = np.concatenate([pos_pick, neg_pick]).astype(np.int64)
    rois = cand[pick]
    labels = (best[pick] >= pos_thr).astype(np.int32)
    deltas = np.zeros((num, 4), np.float32)
    if len(gt_boxes):
        deltas = bbox2delta(rois, gt_boxes[arg[pick]],
                            stds=(0.1, 0.1, 0.2, 0.2))
    return rois, labels, deltas, arg[pick]


def roi_head_losses(cls_logits, pred_deltas, mask_logits, labels, deltas,
                    mask_targets):
    """Second-stage losses (mmdet Shared2FCBBoxHead + FCNMaskHead):
    CE over bg/text, L1 deltas on positives, per-pixel BCE masks on
    positives."""
    import jax
    import jax.numpy as jnp

    labels = jnp.asarray(labels)
    pos = (labels == 1).astype(jnp.float32)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), -1)
    loss_cls = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], -1))
    l1 = jnp.abs(pred_deltas.astype(jnp.float32) -
                 jnp.asarray(deltas)).sum(-1)
    loss_bbox = jnp.sum(l1 * pos) / jnp.maximum(jnp.sum(pos), 1.0)
    m = mask_logits[..., 0].astype(jnp.float32)
    t = jnp.asarray(mask_targets, jnp.float32)
    bce = jnp.maximum(m, 0) - m * t + jnp.log1p(jnp.exp(-jnp.abs(m)))
    loss_mask = jnp.sum(bce.mean(axis=(1, 2)) * pos) / jnp.maximum(
        jnp.sum(pos), 1.0)
    return {'loss_cls': loss_cls, 'loss_bbox': loss_bbox,
            'loss_mask': loss_mask}


def make_mask_targets(rois, gt_masks, matched_idx, out_size=28):
    """Crop each matched gt instance mask to its RoI and resize to the mask
    head's output resolution."""
    out = np.zeros((len(rois), out_size, out_size), np.float32)
    for i, (roi, gi) in enumerate(zip(rois, matched_idx)):
        if gi < 0 or gi >= len(gt_masks):
            continue
        x0, y0, x1, y1 = [int(v) for v in roi]
        H, W = gt_masks[gi].shape
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(max(x1, x0 + 1), W), min(max(y1, y0 + 1), H)
        crop = gt_masks[gi][y0:y1, x0:x1].astype(np.float32)
        if crop.size:
            out[i] = cv2.resize(crop, (out_size, out_size),
                                interpolation=cv2.INTER_NEAREST)
    return out
