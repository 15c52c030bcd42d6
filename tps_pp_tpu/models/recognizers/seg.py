"""Segmentation-based recognizer: FPNOCR neck + SegHead + SegLoss.

Re-implements reference ``necks/fpn_ocr.py:11-91``, ``heads/seg_head.py:
11-66``, ``losses/seg_loss.py:10-80`` and ``recognizer/seg_recognizer.py``.
Backbone must emit multi-scale features (e.g. ResNet31OCR with
out_indices=(0,1,2,3)); gt kernels are dense (N, H, W) int maps with 255 =
ignore (the reference's BitmapMasks path is host-side target generation).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import HEADS, LOSSES, NECKS
from ..layers import ConvModule


@NECKS.register_module()
class FPNOCR(nn.Module):
    in_channels: Sequence[int] = (128, 256, 512, 512)
    out_channels: int = 256
    last_stage_only: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        n_ins = len(self.in_channels)
        laterals = [
            ConvModule(self.out_channels, 1, use_norm=True, dtype=self.dtype,
                       name=f'lateral{i}')(inputs[i], train=train)
            for i in range(n_ins)
        ]
        outs = []
        for i in range(n_ins - 1, 0, -1):
            last = laterals[-1] if not outs else outs[-1]
            N, H, W, C = last.shape
            up = jax.image.resize(last, (N, H * 2, W * 2, C), 'bilinear')
            cat = jnp.concatenate([up, laterals[i - 1]], axis=-1)
            s = ConvModule(self.out_channels, 1, use_norm=True,
                           dtype=self.dtype,
                           name=f'smooth1x1_{i - 1}')(cat, train=train)
            s = ConvModule(self.out_channels, 3, padding=1, use_norm=True,
                           dtype=self.dtype,
                           name=f'smooth3x3_{i - 1}')(s, train=train)
            outs.append(s)
        return outs[-1:] if self.last_stage_only else tuple(outs)


@HEADS.register_module()
class SegHead(nn.Module):
    in_channels: int = 128
    num_classes: int = 37
    upsample: Optional[float] = None
    # reference config form: upsample_param=dict(scale_factor=2.0,
    # mode='nearest') (seg config, seg_head.py) — accepted directly so
    # reference configs translate mechanically
    upsample_param: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, out_neck, train: bool = False):
        x = ConvModule(self.in_channels, 3, padding=1, use_norm=True,
                       dtype=self.dtype, name='seg_conv')(out_neck[-1],
                                                          train=train)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name='pred_conv')(x)
        scale = self.upsample
        mode = 'nearest'
        if self.upsample_param:
            scale = float(self.upsample_param.get('scale_factor', 2.0))
            mode = str(self.upsample_param.get('mode', 'nearest'))
        if scale:
            N, H, W, C = x.shape
            x = jax.image.resize(
                x, (N, int(H * scale), int(W * scale), C),
                'bilinear' if mode == 'bilinear' else 'nearest')
        return x


@LOSSES.register_module()
class SegLoss:
    def __init__(self, seg_downsample_ratio=0.5, seg_with_loss_weight=True,
                 ignore_index=255, **kwargs):
        self.seg_downsample_ratio = seg_downsample_ratio
        self.seg_with_loss_weight = seg_with_loss_weight
        self.ignore_index = ignore_index

    def __call__(self, out_head, gt_kernels, valid_ratio=None):
        """out_head: (N, H, W, C) logits; gt_kernels: (N, H, W) int
        (already at head resolution; 255 = ignore)."""
        C = out_head.shape[-1]
        logits = out_head.reshape(-1, C).astype(jnp.float32)
        target = gt_kernels.reshape(-1)
        valid = target != self.ignore_index
        tgt = jnp.clip(target, 0, C - 1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        if self.seg_with_loss_weight:
            n_valid = jnp.sum(valid)
            n_neg = jnp.sum(valid & (target == 0))
            w_pos = n_neg / jnp.maximum(n_valid - n_neg, 1)
            weights = jnp.where(tgt == 0, 1.0, w_pos)
        else:
            weights = jnp.ones_like(nll)
        weights = weights * valid
        return {'loss_seg': jnp.sum(nll * weights) /
                jnp.maximum(jnp.sum(weights), 1.0)}


class SegRecognizerModule(nn.Module):
    """backbone (multi-scale) -> FPNOCR -> SegHead
    (reference seg_recognizer.py:11-137)."""
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    def __call__(self, img, targets=None, valid_ratio=None,
                 train: bool = False):
        feats = self.backbone(img, train=train)
        out_neck = self.neck(feats, train=train)
        return self.head(out_neck, train=train)

    def forward_test_nar(self, img, valid_ratio=None):
        return self(img, valid_ratio=valid_ratio, train=False)
