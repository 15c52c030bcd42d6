"""ABINet vision-side encoders.

* ``TransformerEncoder`` — reference ``encoders/transformer.py:12-82``:
  1D positional encoding over flattened (H*W) tokens, n_layers mmcv
  BaseTransformerLayer('self_attn','norm','ffn','norm') = post-norm blocks
  with torch-style MHA (qkv bias) and ReLU FFN; reshaped back to (N,H,W,C).
* ``ABIVisionModel`` — reference ``encoders/abinet_vision_model.py:7-45``:
  wraps the encoder and the ABIVisionDecoder, returning
  {'feature','logits','attn_scores'}.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...registry import DECODERS, ENCODERS, MODELS
from ..transformer import MultiHeadAttention, PositionalEncoding


class PostNormTransformerLayer(nn.Module):
    """mmcv BaseTransformerLayer('self_attn','norm','ffn','norm') with
    torch-MHA conventions (qkv bias on)."""
    d_model: int = 512
    d_inner: int = 2048
    n_head: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        d_k = self.d_model // self.n_head
        attn = MultiHeadAttention(self.n_head, self.d_model, d_k, d_k,
                                  self.dropout, qkv_bias=True,
                                  dtype=self.dtype, name='attn')
        x = x + attn(x, x, x, mask=mask, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')(x)
        y = nn.Dense(self.d_inner, dtype=self.dtype, name='ffn_fc1')(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=not train)
        y = nn.Dense(self.d_model, dtype=self.dtype, name='ffn_fc2')(y)
        y = nn.Dropout(self.dropout)(y, deterministic=not train)
        x = x + y
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')(x)


@ENCODERS.register_module()
class TransformerEncoder(nn.Module):
    n_layers: int = 2
    n_head: int = 8
    d_model: int = 512
    d_inner: int = 2048
    dropout: float = 0.1
    max_len: int = 8 * 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, valid_ratio=None, train: bool = False):
        n, h, w, c = feat.shape
        x = feat.reshape(n, h * w, c)
        x = PositionalEncoding(self.d_model, self.max_len, dtype=self.dtype,
                               name='pos_encoder')(x)
        for i in range(self.n_layers):
            x = PostNormTransformerLayer(self.d_model, self.d_inner,
                                         self.n_head, self.dropout,
                                         dtype=self.dtype,
                                         name=f'layer{i}')(x, train=train)
        return x.reshape(n, h, w, c)


@ENCODERS.register_module()
class ABIVisionModel(nn.Module):
    encoder: Optional[Dict] = None
    decoder: Optional[Dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        enc = dict(self.encoder or {'type': 'TransformerEncoder'})
        enc.setdefault('dtype', self.dtype)
        self.enc = MODELS.build(enc)
        dec = dict(self.decoder or {'type': 'ABIVisionDecoder'})
        dec.setdefault('dtype', self.dtype)
        self.dec = MODELS.build(dec)

    def __call__(self, feat, valid_ratio=None, train: bool = False):
        feat = self.enc(feat, valid_ratio=valid_ratio, train=train)
        return self.dec(feat, None, train=train)
