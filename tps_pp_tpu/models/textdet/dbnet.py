"""DBNet text detector — differentiable binarization (§2.8 of SURVEY).

TPU-native re-implementation of the reference's DBNet stack:
  * ResNetDet   — torchvision-style ResNet-18/50-lite trunk emitting C2-C5
    (the reference uses mmdet:ResNet).
  * FPNC        — lateral 1x1 + top-down adds + 3x3 smooth, all scales
    upsampled to 1/4 and concatenated (reference ``necks/fpn_cat.py``).
  * DBHead      — probability/threshold branches with two stride-2
    transposed convs each, fused by the differentiable binarization
    ``1/(1+exp(-k(P-T)))`` with k=50 (reference ``dense_heads/db_head.py``).
  * DBLoss      — balanced BCE (OHEM 1:3) on the prob map, masked L1 on the
    threshold map, dice on the binary map (reference ``losses/db_loss.py``).

Device math is NHWC flax; target generation and polygon post-processing are
host-side (textdet/targets.py, textdet/postprocess.py).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES, HEADS, LOSSES, NECKS
from ..layers import BasicBlock, max_pool


@BACKBONES.register_module()
class ResNetDet(nn.Module):
    """ResNet-18-style trunk: 7x7/2 stem + maxpool, 4 BasicBlock stages,
    outputs (C2, C3, C4, C5) at strides (4, 8, 16, 32)."""
    stage_blocks: Sequence[int] = (2, 2, 2, 2)
    base_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name='stem_conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='stem_bn')(x)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)
        outs = []
        ch = self.base_channels
        for si, blocks in enumerate(self.stage_blocks):
            stride = 1 if si == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                needs_ds = s != 1 or x.shape[-1] != ch
                x = BasicBlock(ch, stride=s, use_conv1x1=False,
                               use_downsample=needs_ds, dtype=self.dtype,
                               name=f'layer{si + 1}_block{b}')(x, train=train)
            outs.append(x)
            ch *= 2
        return tuple(outs)


@NECKS.register_module()
class FPNC(nn.Module):
    in_channels: Sequence[int] = (64, 128, 256, 512)
    lateral_channels: int = 256
    out_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        n = len(inputs)
        laterals = [
            nn.Conv(self.lateral_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name=f'lateral{i}')(inputs[i])
            for i in range(n)
        ]
        # top-down pathway
        for i in range(n - 1, 0, -1):
            N, H, W, C = laterals[i - 1].shape
            laterals[i - 1] = laterals[i - 1] + jax.image.resize(
                laterals[i], (N, H, W, C), 'nearest')
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype,
                    name=f'smooth{i}')(laterals[i])
            for i in range(n)
        ]
        # upsample everything to the 1/4 scale and concat
        N, H, W, _ = outs[0].shape
        ups = [outs[0]] + [
            jax.image.resize(o, (N, H, W, o.shape[-1]), 'nearest')
            for o in outs[1:]
        ]
        return jnp.concatenate(ups, axis=-1)


class _UpBranch(nn.Module):
    """conv3x3-BN-ReLU + two stride-2 transposed convs (db_head.py:60-66)."""
    mid: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.mid, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(self.mid, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name='up1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn2')(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name='up2')(x)
        return jax.nn.sigmoid(x)


@HEADS.register_module()
class DBHead(nn.Module):
    in_channels: int = 256
    k: float = 50.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.in_channels // 4
        prob = _UpBranch(mid, dtype=self.dtype, name='binarize')(x, train)
        thr = _UpBranch(mid, dtype=self.dtype, name='threshold')(x, train)
        binary = 1.0 / (1.0 + jnp.exp(-self.k * (prob - thr)))
        return jnp.concatenate([prob, thr, binary], axis=-1)


@LOSSES.register_module()
class DBLoss:
    """Balanced BCE + masked L1 + dice (reference losses/db_loss.py)."""

    def __init__(self, alpha=5.0, beta=10.0, negative_ratio=3.0, eps=1e-6,
                 **kwargs):
        self.alpha = alpha
        self.beta = beta
        self.negative_ratio = negative_ratio
        self.eps = eps

    def __call__(self, preds, targets):
        """preds: (N, H, W, 3) [prob, thr, binary]; targets dict with
        gt_shrink (N,H,W), gt_shrink_mask, gt_thr (N,H,W), gt_thr_mask."""
        prob = preds[..., 0].astype(jnp.float32)
        thr = preds[..., 1].astype(jnp.float32)
        binary = preds[..., 2].astype(jnp.float32)
        gt = targets['gt_shrink'].astype(jnp.float32)
        mask = targets['gt_shrink_mask'].astype(jnp.float32)
        gt_thr = targets['gt_thr'].astype(jnp.float32)
        thr_mask = targets['gt_thr_mask'].astype(jnp.float32)

        # balanced BCE with OHEM: all positives + top-k negatives (k = 3x
        # positives). Static-shape OHEM via sorted negative losses.
        eps = self.eps
        bce = -(gt * jnp.log(prob + eps) + (1 - gt) * jnp.log(1 - prob + eps))
        pos = gt * mask
        neg = (1 - gt) * mask
        n_pos = jnp.sum(pos)
        n_neg_keep = jnp.minimum(jnp.sum(neg),
                                 n_pos * self.negative_ratio).astype(
            jnp.int32)
        neg_losses = jnp.sort((bce * neg).reshape(-1))[::-1]
        k_mask = (jnp.arange(neg_losses.shape[0]) <
                  n_neg_keep).astype(jnp.float32)
        loss_prob = ((jnp.sum(bce * pos) + jnp.sum(neg_losses * k_mask)) /
                     (n_pos + n_neg_keep + eps))

        loss_thr = (jnp.sum(jnp.abs(thr - gt_thr) * thr_mask) /
                    (jnp.sum(thr_mask) + eps))

        inter = jnp.sum(binary * gt * mask)
        union = jnp.sum(binary * mask) + jnp.sum(gt * mask) + eps
        loss_binary = 1 - 2.0 * inter / union

        return {
            'loss_prob': self.alpha * loss_prob,
            'loss_thr': self.beta * loss_thr,
            'loss_db': loss_binary,
        }


class DBNetModule(nn.Module):
    """backbone -> FPNC -> DBHead (reference detectors/dbnet.py is a
    SingleStageTextDetector tag class)."""
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    def __call__(self, img, train: bool = False):
        feats = self.backbone(img, train=train)
        x = self.neck(feats, train=train)
        return self.head(x, train=train)
