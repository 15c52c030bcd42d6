"""Shared task-agnostic modules (reference ``mmocr/models/common``):
UNet backbone (backbones/unet.py, 516 LoC) and Dice/Focal losses
(losses/dice_loss.py, focal_loss.py)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES, LOSSES
from .layers import max_pool


class _DoubleConv(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name=f'conv{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'bn{i}')(x)
            x = nn.relu(x)
        return x


@BACKBONES.register_module()
class UNet(nn.Module):
    """Classic UNet encoder-decoder (reference common/backbones/unet.py with
    default conv blocks; bilinear upsampling + skip concat)."""
    base_channels: int = 64
    num_stages: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        ch = self.base_channels
        for i in range(self.num_stages):
            if i:
                x = max_pool(x, 2, 2)
            x = _DoubleConv(ch, dtype=self.dtype, name=f'enc{i}')(x,
                                                                  train=train)
            skips.append(x)
            if i < self.num_stages - 1:
                ch *= 2
        for i in range(self.num_stages - 2, -1, -1):
            N, H, W, C = skips[i].shape
            x = jax.image.resize(x, (N, H, W, x.shape[-1]), 'bilinear')
            # reference UNet's default InterpConv: bilinear upsample then a
            # 1x1 conv HALVING channels before the skip concat
            # (common/backbones/unet.py UpConvBlock) — concatenating the
            # full previous-stage width diverges param shapes from torch
            # checkpoints and costs ~50% extra decoder FLOPs
            x = nn.Conv(skips[i].shape[-1], (1, 1), dtype=self.dtype,
                        name=f'up{i}')(x)
            x = jnp.concatenate([skips[i], x], axis=-1)
            x = _DoubleConv(skips[i].shape[-1], dtype=self.dtype,
                            name=f'dec{i}')(x, train=train)
        return x


@LOSSES.register_module()
class DiceLoss:
    def __init__(self, eps=1e-6, **kwargs):
        self.eps = eps

    def __call__(self, pred, target, mask=None):
        """pred: probabilities in [0,1]; same shape target/mask."""
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if mask is not None:
            pred = pred * mask
            target = target * mask
        inter = jnp.sum(pred * target)
        union = jnp.sum(pred * pred) + jnp.sum(target * target) + self.eps
        return 1.0 - 2.0 * inter / union


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, gamma=2.0, alpha=0.25, **kwargs):
        self.gamma = gamma
        self.alpha = alpha

    def __call__(self, logits, targets):
        """Binary focal loss over logits/0-1 targets of the same shape."""
        p = jax.nn.sigmoid(logits.astype(jnp.float32))
        t = targets.astype(jnp.float32)
        pt = p * t + (1 - p) * (1 - t)
        alpha_t = self.alpha * t + (1 - self.alpha) * (1 - t)
        loss = -alpha_t * (1 - pt) ** self.gamma * jnp.log(
            jnp.clip(pt, 1e-8, 1.0))
        return jnp.mean(loss)
