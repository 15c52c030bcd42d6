"""NRTR transformer encoder (reference ``encoders/nrtr_encoder.py:13-87``).

Self-attention over the flattened (N, H*W, C) feature with a valid_ratio
mask. Quirk preserved: the reference builds the mask over the *flattened
token index* (``valid_width = ceil(H*W * valid_ratio)``,
nrtr_encoder.py:60-62), not over the width axis. Masks are computed from a
fixed-shape ``valid_ratio`` array (device-friendly) instead of python
img_metas.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...registry import ENCODERS
from ..transformer import TFEncoderLayer


def sequence_mask(valid_ratio, T: int):
    """(N,) ratios -> (N, T) 0/1 mask with ceil semantics
    (matches reference ``min(T, ceil(T * valid_ratio))``)."""
    if valid_ratio is None:
        return None
    valid_width = jnp.minimum(T, jnp.ceil(T * valid_ratio)).astype(jnp.int32)
    idx = jnp.arange(T)[None, :]
    return (idx < valid_width[:, None]).astype(jnp.float32)


@ENCODERS.register_module()
class NRTREncoder(nn.Module):
    n_layers: int = 6
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_model: int = 512
    d_inner: int = 256
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, valid_ratio=None, train: bool = False):
        # feat: (N, H, W, C) NHWC -> tokens (N, H*W, C), row-major like the
        # reference's view(n, c, h*w).permute (nrtr_encoder.py:78)
        n, h, w, c = feat.shape
        x = feat.reshape(n, h * w, c)
        mask = sequence_mask(valid_ratio, h * w)
        for i in range(self.n_layers):
            x = TFEncoderLayer(self.d_model, self.d_inner, self.n_head,
                               self.d_k, self.d_v, self.dropout,
                               dtype=self.dtype, name=f'layer{i}')(
                x, mask=mask, deterministic=not train)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='layer_norm')(x)
