"""ABINet-style ResNet backbones with the mid-backbone TPS++ hook.

TPU-native re-implementations of:
  * ``ResNetABI`` (reference ``backbones/resnet_abi.py:11-129``): stem s1,
    5 stages of conv1x1-style BasicBlocks, default strides [2,1,2,1,1],
    TPS++ hook before stage 3 (resnet_abi.py:119-124).
  * ``ResNetABI_v2_large`` (reference ``backbones/resnet_v2_large.py:26-196``):
    the NRTR+TPS++ flagship backbone — stem 32ch, arch [3,4,6,6,3],
    tpsnet injected before stage 3 with the two earlier feature maps
    (resnet_v2_large.py:183-191); returns a dict with the rectified
    reference feature.

Geometry note: the shipped flagship config's ``strides=[2,1,2,1,2]``
(reference configs/textrecog/nrtr/nrtr_tps++.py:37) is spatially inconsistent
with TPS_PP.forward (verified by simulation — see SURVEY.md §2.3). We default
to the consistent variant ``[1,2,2,1,2]``: stem@32x128, layer1 s1 (skip for
TPS at 32x128), layer2 s2 -> 16x64 where TPS++ runs, then 2,1,2 tail giving
4x16x512 tokens for NRTR.

Rather than passing a module as ``tpsnet`` the way the reference threads a
Module handle through ``forward`` (resnet_v2_large.py:163-196), the recognizer
composes ``stem_stages() -> rectifier -> tail_stages()`` explicitly — a
functional split that jits cleanly.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..layers import BasicBlock


class _ResLayer(nn.Module):
    planes: int
    blocks: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_ds = self.stride != 1 or x.shape[-1] != self.planes
        x = BasicBlock(self.planes, stride=self.stride, use_conv1x1=True,
                       use_downsample=needs_ds, dtype=self.dtype,
                       name='block0')(x, train=train)
        for b in range(1, self.blocks):
            x = BasicBlock(self.planes, use_conv1x1=True, dtype=self.dtype,
                           name=f'block{b}')(x, train=train)
        return x


class ResNetABIBase(nn.Module):
    """Shared trunk. ``tps_stage`` marks where the rectifier splices in:
    ``stem_and_head`` runs stem+stages[:tps_stage] returning (x, skips);
    ``tail`` runs the remaining stages."""
    in_channels: int = 3
    stem_channels: int = 32
    base_channels: int = 32
    arch_settings: Sequence[int] = (3, 4, 6, 6, 3)
    strides: Sequence[int] = (2, 1, 2, 1, 1)
    tps_stage: int = 2
    out_indices: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.stem_conv = nn.Conv(self.stem_channels, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)), dtype=self.dtype,
                                 name='conv1')
        self.stem_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name='bn1')
        layers = []
        planes = self.base_channels
        for i, num_blocks in enumerate(self.arch_settings):
            layers.append(_ResLayer(planes, num_blocks, self.strides[i],
                                    dtype=self.dtype, name=f'layer{i + 1}'))
            planes *= 2
        self.res_layers = layers

    def stem_and_head(self, x, train: bool = False):
        x = self.stem_conv(x)
        x = self.stem_bn(x, use_running_average=not train)
        x = nn.relu(x)
        skips: List = []
        for layer in self.res_layers[:self.tps_stage]:
            skips.append(x)
            x = layer(x, train=train)
        return x, skips

    def tail(self, x, train: bool = False):
        outs = []
        for layer in self.res_layers[self.tps_stage:]:
            outs.append(x)
            x = layer(x, train=train)
        if self.out_indices is not None:
            all_outs = outs + [x]
            return tuple(all_outs[i] for i in self.out_indices)
        return x

    def __call__(self, x, train: bool = False):
        x, _ = self.stem_and_head(x, train=train)
        return self.tail(x, train=train)


@BACKBONES.register_module()
class ResNetABI(ResNetABIBase):
    """ABINet ResNet-45 (reference resnet_abi.py): output 512ch @ H/4."""
    pass


@BACKBONES.register_module()
class ResNetABI_v2_large(ResNetABIBase):
    """NRTR+TPS++ flagship backbone (reference resnet_v2_large.py) with the
    consistent stride geometry (see module docstring)."""
    strides: Sequence[int] = (1, 2, 2, 1, 2)
