"""SATRN encoder: adaptive 2D positional encoding + locality-aware FFN.

Re-implements reference ``encoders/satrn_encoder.py:13-85`` and
``layers/satrn_layers.py`` (SatrnEncoderLayer :11-42,
LocalityAwareFeedforward :45-93, Adaptive2DPositionalEncoding :96-167).
Masks derive from a valid_ratio array over the width axis (satrn builds the
mask per-width before flattening, unlike NRTR's flat-token quirk).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import ENCODERS
from ..layers import ConvModule
from ..transformer import MultiHeadAttention, sinusoid_position_table


class Adaptive2DPositionalEncoding(nn.Module):
    d_hid: int = 512
    n_height: int = 100
    n_width: int = 100
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (N, H, W, C)
        N, H, W, C = x.shape
        h_table = jnp.asarray(sinusoid_position_table(self.n_height,
                                                      self.d_hid))[0]
        w_table = jnp.asarray(sinusoid_position_table(self.n_width,
                                                      self.d_hid))[0]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)   # (N,1,1,C)

        def scale(name, v):
            v = nn.Conv(self.d_hid, (1, 1), dtype=self.dtype,
                        name=f'{name}_0')(v)
            v = nn.relu(v)
            v = nn.Conv(self.d_hid, (1, 1), dtype=self.dtype,
                        name=f'{name}_1')(v)
            return jax.nn.sigmoid(v)

        h_pos = scale('h_scale', pooled) * h_table[None, :H, None, :]
        w_pos = scale('w_scale', pooled) * w_table[None, None, :W, :]
        out = x + h_pos.astype(x.dtype) + w_pos.astype(x.dtype)
        return nn.Dropout(self.dropout)(out, deterministic=not train)


class LocalityAwareFeedforward(nn.Module):
    d_in: int
    d_hid: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(self.d_hid, 1, use_norm=True, dtype=self.dtype,
                       name='conv1')(x, train=train)
        # depthwise 3x3
        x = nn.Conv(self.d_hid, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.d_hid, use_bias=False,
                    dtype=self.dtype, name='depthwise_conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='depthwise_bn')(x)
        x = nn.relu(x)
        x = ConvModule(self.d_in, 1, use_norm=True, dtype=self.dtype,
                       name='conv2')(x, train=train)
        return x


class SatrnEncoderLayer(nn.Module):
    d_model: int = 512
    d_inner: int = 512
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h: int, w: int, mask=None, train: bool = False):
        n, hw, c = x.shape
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')(x)
        x = x + MultiHeadAttention(self.n_head, self.d_model, self.d_k,
                                   self.d_v, self.dropout, dtype=self.dtype,
                                   name='attn')(y, y, y, mask=mask,
                                                deterministic=not train)
        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')(x)
        y = y.reshape(n, h, w, c)
        y = LocalityAwareFeedforward(self.d_model, self.d_inner,
                                     dtype=self.dtype,
                                     name='feed_forward')(y, train=train)
        return residual + y.reshape(n, hw, c)


@ENCODERS.register_module()
class SatrnEncoder(nn.Module):
    n_layers: int = 12
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_model: int = 512
    n_position: int = 100
    d_inner: int = 256
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, valid_ratio=None, train: bool = False):
        # feat: (N, H, W, C)
        n, h, w, c = feat.shape
        feat = feat + Adaptive2DPositionalEncoding(
            self.d_model, self.n_position, self.n_position, self.dropout,
            dtype=self.dtype, name='position_enc')(feat, train=train)
        if valid_ratio is not None:
            valid_width = jnp.minimum(
                w, jnp.ceil(w * valid_ratio)).astype(jnp.int32)
            col = jnp.arange(w)[None, :]
            mask = (col < valid_width[:, None]).astype(jnp.float32)
            mask = jnp.repeat(mask[:, None, :], h, axis=1).reshape(n, h * w)
        else:
            mask = None
        x = feat.reshape(n, h * w, c)
        for i in range(self.n_layers):
            x = SatrnEncoderLayer(self.d_model, self.d_inner, self.n_head,
                                  self.d_k, self.d_v, self.dropout,
                                  dtype=self.dtype, name=f'layer{i}')(
                x, h, w, mask=mask, train=train)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='layer_norm')(x)


@ENCODERS.register_module()
class ChannelReductionEncoder(nn.Module):
    """1x1 conv channel reduction (reference
    encoders/channel_reduction_encoder.py)."""
    in_channels: int = 512
    out_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, valid_ratio=None, train: bool = False):
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name='layer')(feat)
