"""ResNet31-OCR backbone (NRTR/SAR/SATRN standard).

Re-implements reference ``backbones/resnet31_ocr.py:11-159``: two stem convs,
then four (pool, residual-blocks, conv-bn-relu) stages with asymmetric
stage-4 pooling; the TPS++ hook sits at stage-2 exit (resnet31_ocr.py:147-152).
Blocks are plain BasicBlocks (3x3+3x3) with 1x1 downsample when channels
change (stride 1).
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..layers import BasicBlock, max_pool


class _ConvBnRelu(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        return nn.relu(x)


class _Blocks(nn.Module):
    channels: int
    blocks: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for b in range(self.blocks):
            needs_ds = x.shape[-1] != self.channels
            x = BasicBlock(self.channels, stride=1, use_conv1x1=False,
                           use_downsample=needs_ds, dtype=self.dtype,
                           name=f'block{b}')(x, train=train)
        return x


@BACKBONES.register_module()
class ResNet31OCR(nn.Module):
    base_channels: int = 3
    layers: Sequence[int] = (1, 2, 5, 3)
    channels: Sequence[int] = (64, 128, 256, 256, 512, 512, 512)
    out_indices: Optional[Sequence[int]] = None
    stage4_pool: Optional[Tuple[int, int]] = (2, 1)
    # reference config key (resnet31_ocr.py): dict(kernel_size=..,
    # stride=..) or None for no stage-4 pool; takes precedence so
    # reference configs translate mechanically
    stage4_pool_cfg: Optional[dict] = 'unset'
    last_stage_pool: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        ch = self.channels
        self.stem1 = _ConvBnRelu(ch[0], dtype=self.dtype)
        self.stem2 = _ConvBnRelu(ch[1], dtype=self.dtype)
        self.block2 = _Blocks(ch[2], self.layers[0], dtype=self.dtype)
        self.conv2 = _ConvBnRelu(ch[2], dtype=self.dtype)
        self.block3 = _Blocks(ch[3], self.layers[1], dtype=self.dtype)
        self.conv3 = _ConvBnRelu(ch[3], dtype=self.dtype)
        self.block4 = _Blocks(ch[4], self.layers[2], dtype=self.dtype)
        self.conv4 = _ConvBnRelu(ch[4], dtype=self.dtype)
        self.block5 = _Blocks(ch[5], self.layers[3], dtype=self.dtype)
        self.conv5 = _ConvBnRelu(ch[5], dtype=self.dtype)

    def stem_and_head(self, x, train: bool = False):
        """Stem + stage 2 (where the reference's tps hook lives)."""
        outs: List = []
        x = self.stem1(x, train=train)
        outs.append(x)
        x = self.stem2(x, train=train)
        outs.append(x)
        x = max_pool(x, 2, 2)
        x = self.block2(x, train=train)
        x = self.conv2(x, train=train)
        return x, outs

    def tail(self, x, train: bool = False):
        # out_indices follows the reference contract (resnet31_ocr.py
        # forward): index over the FOUR residual-stage outputs only —
        # 0=stage2 ... 3=stage5 (stems are internal skip-connection taps)
        outs = [x]
        x = max_pool(x, 2, 2)
        x = self.block3(x, train=train)
        x = self.conv3(x, train=train)
        outs.append(x)
        pool4 = self.stage4_pool
        stride4 = None
        if self.stage4_pool_cfg != 'unset':
            # reference config form stage4_pool_cfg=dict(kernel_size=2,
            # stride=2) — values may be ints (nn.MaxPool2d style) or pairs
            if self.stage4_pool_cfg:
                k = self.stage4_pool_cfg['kernel_size']
                pool4 = (k, k) if isinstance(k, int) else tuple(k)
                st = self.stage4_pool_cfg.get('stride', k)
                stride4 = (st, st) if isinstance(st, int) else tuple(st)
            else:
                pool4 = None
        if pool4:
            x = max_pool(x, pool4, stride4 or pool4)
        x = self.block4(x, train=train)
        x = self.conv4(x, train=train)
        outs.append(x)
        if self.last_stage_pool:
            x = max_pool(x, 2, 2)
        x = self.block5(x, train=train)
        x = self.conv5(x, train=train)
        outs.append(x)
        if self.out_indices is not None:
            return tuple(outs[i] for i in self.out_indices)
        return x

    def __call__(self, x, train: bool = False):
        x, outs = self.stem_and_head(x, train=train)
        return self.tail(x, train=train)
