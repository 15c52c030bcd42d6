"""Transformer primitives matching the reference's op ordering exactly.

TPU-native re-implementation of reference
``mmocr/models/common/modules/transformer_module.py`` (MultiHeadAttention
:36-98, ScaledDotProductAttention :9-33, PositionwiseFeedForward :101-126,
PositionalEncoding :129-163) and
``mmocr/models/common/layers/transformer_layers.py`` (TFEncoderLayer :9-73,
TFDecoderLayer :76-167). Head split shapes, the ``temperature=sqrt(d_k)``
scaling, mask==0 -> -inf fill, and the pre/post-norm operation orders are all
preserved so converted checkpoints are numerically faithful.

KV-cached incremental attention for autoregressive decode is provided here as
well — semantics-preserving (greedy argmax sequence identical to the
reference's full-prefix recompute loop at nrtr_decoder.py:153-177, since pad
positions beyond the current step are masked out there anyway).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any
NEG_INF = -1e9  # finite -inf stand-in: safe under bf16/softmax on TPU


def sinusoid_position_table(n_position: int, d_hid: int) -> np.ndarray:
    """(1, n_position, d_hid) table with the reference's exact formula
    (transformer_module.py:142-154)."""
    denom = np.array([
        1.0 / np.power(10000, 2 * (j // 2) / d_hid) for j in range(d_hid)
    ], dtype=np.float64).reshape(1, -1)
    pos = np.arange(n_position, dtype=np.float64).reshape(-1, 1)
    table = pos * denom
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table[None].astype(np.float32)


class PositionalEncoding(nn.Module):
    d_hid: int = 512
    n_position: int = 200
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, offset: int = 0):
        table = jnp.asarray(sinusoid_position_table(self.n_position,
                                                    self.d_hid))
        x = x + jax.lax.dynamic_slice_in_dim(
            table, offset, x.shape[1], axis=1).astype(x.dtype)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MultiHeadAttention(nn.Module):
    """Reference MultiHeadAttention (transformer_module.py:36-98): separate
    q/k/v linears (bias follows qkv_bias — including the output fc), softmax
    over temperature-scaled scores, attn-dropout then proj-dropout."""
    n_head: int = 8
    d_model: int = 512
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.1
    # output-projection dropout rate; None = same as ``dropout`` (the
    # reference transformer uses one rate, BERT uses hidden vs attn)
    proj_dropout: Optional[float] = None
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        dim_k = self.n_head * self.d_k
        dim_v = self.n_head * self.d_v
        self.linear_q = nn.Dense(dim_k, use_bias=self.qkv_bias,
                                 dtype=self.dtype)
        self.linear_k = nn.Dense(dim_k, use_bias=self.qkv_bias,
                                 dtype=self.dtype)
        self.linear_v = nn.Dense(dim_v, use_bias=self.qkv_bias,
                                 dtype=self.dtype)
        self.fc = nn.Dense(self.d_model, use_bias=self.qkv_bias,
                           dtype=self.dtype)
        self.attn_drop = nn.Dropout(self.dropout)
        self.proj_drop = nn.Dropout(
            self.dropout if self.proj_dropout is None
            else self.proj_dropout)

    def _split(self, x, d):
        N, T, _ = x.shape
        return x.reshape(N, T, self.n_head, d).transpose(0, 2, 1, 3)

    def _attend(self, q, k, v, mask, deterministic):
        scale = 1.0 / (self.d_k ** 0.5)
        attn = jnp.einsum('nhqd,nhkd->nhqk', q * scale, k,
                          preferred_element_type=jnp.float32)
        if mask is not None:
            # mask: broadcastable to (N, 1|h, Tq|1, Tk); 0 = masked
            attn = jnp.where(mask == 0, NEG_INF, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = self.attn_drop(attn, deterministic=deterministic)
        out = jnp.einsum('nhqk,nhkd->nhqd', attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        N, _, Tq, _ = out.shape
        return out.transpose(0, 2, 1, 3).reshape(N, Tq,
                                                 self.n_head * self.d_v)

    def __call__(self, q, k, v, mask=None, deterministic: bool = True):
        q = self._split(self.linear_q(q), self.d_k)
        k = self._split(self.linear_k(k), self.d_k)
        v = self._split(self.linear_v(v), self.d_v)
        if mask is not None:
            if mask.ndim == 3:       # (N, Tq, Tk)
                mask = mask[:, None]
            elif mask.ndim == 2:     # (N, Tk)
                mask = mask[:, None, None]
        out = self._attend(q, k, v, mask, deterministic)
        out = self.fc(out)
        return self.proj_drop(out, deterministic=deterministic)

    def project_kv(self, kv):
        """Precompute split K/V for cached cross-attention."""
        return (self._split(self.linear_k(kv), self.d_k),
                self._split(self.linear_v(kv), self.d_v))

    def call_cached(self, q, k_cache, v_cache, mask=None,
                    deterministic: bool = True):
        """Attention with externally supplied (already-projected, split)
        K/V — the KV-cache fast path for scan decode."""
        q = self._split(self.linear_q(q), self.d_k)
        if mask is not None and mask.ndim == 2:
            mask = mask[:, None, None]
        elif mask is not None and mask.ndim == 3:
            mask = mask[:, None]
        out = self._attend(q, k_cache, v_cache, mask, deterministic)
        out = self.fc(out)
        return self.proj_drop(out, deterministic=deterministic)
    def qkv_fused(self, y):
        """Q/K/V of a (N, 1, D) step in ONE matmul against the concatenated
        kernels — decode-path optimization; parameters unchanged, so
        checkpoint conversion is unaffected."""
        pq = self.linear_q.variables['params']
        pk = self.linear_k.variables['params']
        pv = self.linear_v.variables['params']
        W = jnp.concatenate([pq['kernel'], pk['kernel'], pv['kernel']],
                            axis=1)
        out = jnp.einsum('ntd,de->nte', y, W.astype(y.dtype),
                         preferred_element_type=jnp.float32).astype(y.dtype)
        if self.qkv_bias:
            out = out + jnp.concatenate(
                [pq['bias'], pk['bias'], pv['bias']]).astype(y.dtype)
        dim_k = self.n_head * self.d_k
        q, k, v = jnp.split(out, [dim_k, 2 * dim_k], axis=-1)
        return (self._split(q, self.d_k), self._split(k, self.d_k),
                self._split(v, self.d_v))

    def finish(self, merged, deterministic: bool = True):
        """Output projection + dropout over an _attend result."""
        return self.proj_drop(self.fc(merged), deterministic=deterministic)


class PositionwiseFeedForward(nn.Module):
    """w2(act(w1(x))) + dropout (reference transformer_module.py:101-126)."""
    d_in: int
    d_hid: int
    dropout: float = 0.1
    act: str = 'gelu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.d_hid, dtype=self.dtype, name='w_1')(x)
        if self.act == 'gelu':
            x = nn.gelu(x, approximate=False)
        elif self.act == 'relu':
            x = nn.relu(x)
        else:
            raise ValueError(self.act)
        x = nn.Dense(self.d_in, dtype=self.dtype, name='w_2')(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class TFEncoderLayer(nn.Module):
    """Self-attn + FFN with either pre-norm ('norm','self_attn','norm','ffn')
    or post-norm order (reference transformer_layers.py:55-73)."""
    d_model: int = 512
    d_inner: int = 256
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.1
    qkv_bias: bool = False
    act: str = 'gelu'
    prenorm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        attn = MultiHeadAttention(self.n_head, self.d_model, self.d_k,
                                  self.d_v, self.dropout,
                                  qkv_bias=self.qkv_bias,
                                  dtype=self.dtype, name='attn')
        mlp = PositionwiseFeedForward(self.d_model, self.d_inner,
                                      self.dropout, self.act, self.dtype,
                                      name='mlp')
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')
        if self.prenorm:
            x = x + attn(*(norm1(x),) * 3, mask=mask,
                         deterministic=deterministic)
            x = x + mlp(norm2(x), deterministic=deterministic)
        else:
            x = norm1(x + attn(x, x, x, mask=mask,
                               deterministic=deterministic))
            x = norm2(x + mlp(x, deterministic=deterministic))
        return x


class TFDecoderLayer(nn.Module):
    """Self-attn + cross-attn + FFN (reference transformer_layers.py:132-167).
    Exposes a cached path for scan decode."""
    d_model: int = 512
    d_inner: int = 256
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.1
    qkv_bias: bool = False
    act: str = 'gelu'
    prenorm: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.self_attn = MultiHeadAttention(self.n_head, self.d_model,
                                            self.d_k, self.d_v, self.dropout,
                                            qkv_bias=self.qkv_bias,
                                            dtype=self.dtype)
        self.enc_attn = MultiHeadAttention(self.n_head, self.d_model,
                                           self.d_k, self.d_v, self.dropout,
                                           qkv_bias=self.qkv_bias,
                                           dtype=self.dtype)
        self.mlp = PositionwiseFeedForward(self.d_model, self.d_inner,
                                           self.dropout, self.act, self.dtype)

    def __call__(self, dec_input, enc_output, self_attn_mask=None,
                 dec_enc_attn_mask=None, deterministic: bool = True):
        if self.prenorm:
            x = self.norm1(dec_input)
            x = dec_input + self.self_attn(x, x, x, mask=self_attn_mask,
                                           deterministic=deterministic)
            y = self.norm2(x)
            x = x + self.enc_attn(y, enc_output, enc_output,
                                  mask=dec_enc_attn_mask,
                                  deterministic=deterministic)
            x = x + self.mlp(self.norm3(x), deterministic=deterministic)
        else:
            x = self.norm1(dec_input + self.self_attn(
                dec_input, dec_input, dec_input, mask=self_attn_mask,
                deterministic=deterministic))
            x = self.norm2(x + self.enc_attn(
                x, enc_output, enc_output, mask=dec_enc_attn_mask,
                deterministic=deterministic))
            x = self.norm3(x + self.mlp(x, deterministic=deterministic))
        return x
    def project_enc_kv(self, enc_output):
        return self.enc_attn.project_kv(enc_output)
