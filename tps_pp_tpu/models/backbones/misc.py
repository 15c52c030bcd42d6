"""Small stems: ShallowCNN (SATRN) and NRTRModalityTransform.

Reference: ``backbones/shallow_cnn.py:10-69`` (two conv-BN-ReLU + pool
halvings) and ``backbones/nrtr_modality_transformer.py:9-56`` (two strided
convs, then a Linear over the flattened (h*c) column axis producing
(N, 512, 1, W/4) — here NHWC (N, 1, W/4, 512)).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..layers import max_pool


@BACKBONES.register_module()
class ShallowCNN(nn.Module):
    input_channels: int = 1
    hidden_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate([self.hidden_dim // 2, self.hidden_dim]):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f'conv{i + 1}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'bn{i + 1}')(x)
            x = nn.relu(x)
            x = max_pool(x, 2, 2)
        return x


@BACKBONES.register_module()
class NRTRModalityTransform(nn.Module):
    input_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='conv_1')(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn_1')(x)
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='conv_2')(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn_2')(x)
        n, h, w, c = x.shape
        # torch permutes NCHW->(n, w, h*c) with h-major then c; our NHWC
        # equivalent: (n, w, h, c) -> flatten (h, c)
        x = x.transpose(0, 2, 1, 3).reshape(n, w, h * c)
        x = nn.Dense(512, dtype=self.dtype, name='linear')(x)
        return x.reshape(n, 1, w, 512)
