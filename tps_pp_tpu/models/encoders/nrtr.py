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
    SUPPORTS_FUSED_FORWARD = True

    n_layers: int = 6
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_model: int = 512
    d_inner: int = 256
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, valid_ratio=None, train: bool = False,
                 fused: bool = False):
        # feat: (N, H, W, C) NHWC -> tokens (N, H*W, C), row-major like the
        # reference's view(n, c, h*w).permute (nrtr_encoder.py:78)
        n, h, w, c = feat.shape
        x = feat.reshape(n, h * w, c)
        mask = sequence_mask(valid_ratio, h * w)
        # params are created unconditionally so both paths share them
        layers = [TFEncoderLayer(self.d_model, self.d_inner, self.n_head,
                                 self.d_k, self.d_v, self.dropout,
                                 dtype=self.dtype, name=f'layer{i}')
                  for i in range(self.n_layers)]
        final_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                name='layer_norm')
        if fused and not train:
            return self._fused(layers, x, mask)
        for layer in layers:
            x = layer(x, mask=mask, deterministic=not train)
        return final_ln(x)

    def _fused(self, layers, x, mask):
        """All layers + final LN in one pallas kernel (TPU serving path —
        ops/pallas_encoder.py). Requires d_k == d_v and qkv_bias=False
        (NRTR defaults; params must already exist — init runs the XLA
        path)."""
        from ...ops.pallas_encoder import fused_encoder_forward

        stacks = {k: [] for k in ('ln1_s', 'ln1_b', 'ln2_s', 'ln2_b',
                                  'wqkv', 'wfc', 'w1', 'b1', 'w2', 'b2')}
        for layer in layers:
            # bind the lazily-created submodules by running setup-style
            # access through the compact params: TFEncoderLayer is compact,
            # so pull its params from our own variables tree
            p = self.variables['params'][layer.name]
            stacks['ln1_s'].append(p['norm1']['scale'][None, :])
            stacks['ln1_b'].append(p['norm1']['bias'][None, :])
            stacks['ln2_s'].append(p['norm2']['scale'][None, :])
            stacks['ln2_b'].append(p['norm2']['bias'][None, :])
            a = p['attn']
            stacks['wqkv'].append(jnp.concatenate(
                [a['linear_q']['kernel'], a['linear_k']['kernel'],
                 a['linear_v']['kernel']], axis=1))
            stacks['wfc'].append(a['fc']['kernel'])
            m = p['mlp']
            stacks['w1'].append(m['w_1']['kernel'])
            stacks['b1'].append(m['w_1']['bias'][None, :])
            stacks['w2'].append(m['w_2']['kernel'])
            stacks['b2'].append(m['w_2']['bias'][None, :])
        weights = {k: jnp.stack(v) for k, v in stacks.items()}
        lnf = self.variables['params']['layer_norm']
        weights['lnf_s'] = lnf['scale'][None, :]
        weights['lnf_b'] = lnf['bias'][None, :]
        T = x.shape[1]
        cdt = ('bfloat16' if self.dtype == jnp.bfloat16 else
               jnp.dtype(self.dtype).name)
        return fused_encoder_forward(x, mask, weights, T=T, H=self.n_head,
                                     compute_dtype=cdt).astype(x.dtype)
