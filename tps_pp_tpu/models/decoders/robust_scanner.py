"""RobustScanner decoder family.

Re-implements reference ``decoders/sequence_attention_decoder.py`` (hybrid
branch), ``decoders/position_attention_decoder.py`` (position branch),
``decoders/robust_scanner_decoder.py`` (GLU fusion) and the shared layers
``DotProductAttentionLayer`` / ``PositionAwareLayer`` /
``RobustScannerFusionLayer`` (textrecog/layers/*).

The reference's test loops re-run the full query LSTM over the growing
decode_sequence each step (sequence_attention_decoder.py:147-177). LSTMs are
causal, so the TPU version carries LSTM state through ``lax.scan`` — same
per-step math. The position branch is query-static and computed once.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import DECODERS
from ..layers import TorchLSTMCellScan


def _lstm_cell_step(rnn: TorchLSTMCellScan, x, h, c):
    """Single step sharing TorchLSTMCellScan params (torch gate order)."""
    p = rnn.variables['params']
    gates = (x @ p['weight_ih'].T + p['bias_ih'] + h @ p['weight_hh'].T +
             p['bias_hh'])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _gru_cell_step(rnn, x, h, c):
    """Single step sharing TorchGRUCellScan params (torch gate order r,z,n;
    b_hn inside the reset product). The unused ``c`` slot keeps the LSTM
    carry signature so SAR's ``dec_gru`` dispatch (reference
    sar_decoder.py:353-358 ``hx = cx = GRUCell(...)``) drops in — the new
    hidden state is returned in both slots."""
    p = rnn.variables['params']
    xw = x @ p['weight_ih'].T + p['bias_ih']
    hw = h @ p['weight_hh'].T + p['bias_hh']
    xr, xz, xn = jnp.split(xw, 3, axis=-1)
    hr, hz, hn = jnp.split(hw, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h = (1.0 - z) * n + z * h
    return h, h


def dot_product_attention(query, key, value, mask=None, scale=1.0):
    """query (N, T, D), key/value (N, L, D/Dv), mask (N, L) True=masked.
    Reference layers/dot_product_attention_layer.py."""
    logits = jnp.einsum('ntd,nld->ntl', query, key,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, :], -1e9, logits)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum('ntl,nlv->ntv', weights, value,
                      preferred_element_type=jnp.float32).astype(value.dtype)


def _width_mask(valid_ratio, h: int, w: int):
    """(N, h*w) True where MASKED (invalid columns), per the reference's
    valid_width convention."""
    if valid_ratio is None:
        return None
    valid_width = jnp.minimum(w, jnp.ceil(w * valid_ratio)).astype(jnp.int32)
    col = jnp.arange(w)[None, :] >= valid_width[:, None]      # (N, w)
    return jnp.repeat(col[:, None, :], h, axis=1).reshape(col.shape[0], h * w)


class PositionAwareLayer(nn.Module):
    """Row-wise LSTM + 2-conv mixer (reference layers/position_aware_layer.py)."""
    dim_model: int
    rnn_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, C); LSTM over W with N*H as batch
        n, h, w, c = x.shape
        y = x.reshape(n * h, w, c)
        for i in range(self.rnn_layers):
            y = TorchLSTMCellScan(self.dim_model, dtype=self.dtype,
                                  name=f'rnn{i}')(y)
        y = y.reshape(n, h, w, self.dim_model)
        y = nn.Conv(self.dim_model, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='mixer0')(y)
        y = nn.relu(y)
        y = nn.Conv(self.dim_model, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='mixer1')(y)
        return y


@DECODERS.register_module()
class SequenceAttentionDecoder(nn.Module):
    IS_AUTOREGRESSIVE = True

    num_classes: int = 37
    rnn_layers: int = 2
    dim_input: int = 512
    dim_model: int = 128
    max_seq_len: int = 40
    start_idx: int = 0
    mask: bool = True
    padding_idx: Optional[int] = None
    dropout: float = 0.0
    return_feature: bool = False
    encode_value: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.num_classes, self.dim_model,
                                  dtype=self.dtype)
        self.rnns = [TorchLSTMCellScan(self.dim_model, dtype=self.dtype)
                     for _ in range(self.rnn_layers)]
        if not self.return_feature:
            self.prediction = nn.Dense(self.num_classes - 1,
                                       dtype=self.dtype)

    def _query(self, emb):
        y = emb
        for rnn in self.rnns:
            y = rnn(y)
        return y

    def _attend(self, query, feat, out_enc, valid_ratio):
        n, h, w, c_enc = out_enc.shape
        key = out_enc.reshape(n, h * w, c_enc)
        value = (key if self.encode_value
                 else feat.reshape(n, h * w, feat.shape[-1]))
        mask = _width_mask(valid_ratio, h, w) if self.mask else None
        return dot_product_attention(query, key, value, mask)

    def _embed(self, tokens):
        emb = self.embedding(tokens)
        if self.padding_idx is not None:
            # torch nn.Embedding(padding_idx=...) pins the row at zero;
            # pad tokens feed the query LSTM so a drifting row would
            # diverge the state from the reference
            emb = jnp.where((tokens == self.padding_idx)[..., None],
                            0.0, emb)
        return emb

    def __call__(self, feat, out_enc, targets=None, valid_ratio=None,
                 train: bool = False):
        emb = self._embed(targets)
        query = self._query(emb)
        attn = self._attend(query, feat, out_enc, valid_ratio)
        if self.return_feature:
            return attn
        return self.prediction(attn)

    # --- AR protocol -------------------------------------------------------
    def decode_init(self, feat, out_enc, valid_ratio=None):
        N = out_enc.shape[0]
        z = jnp.zeros((N, self.dim_model), self.dtype)
        carry = tuple((z, z) for _ in range(self.rnn_layers))
        return carry, (feat, out_enc, valid_ratio)

    def decode_step(self, token, t, carry, static):
        feat, out_enc, valid_ratio = static
        x = self._embed(token)
        new_carry = []
        for rnn, (h, c) in zip(self.rnns, carry):
            h, c = _lstm_cell_step(rnn, x, h, c)
            new_carry.append((h, c))
            x = h
        attn = self._attend(x[:, None, :], feat, out_enc, valid_ratio)[:, 0]
        if self.return_feature:
            return attn, tuple(new_carry)
        out = self.prediction(attn)
        probs = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
        return probs, tuple(new_carry)


@DECODERS.register_module()
class PositionAttentionDecoder(nn.Module):
    IS_AUTOREGRESSIVE = False

    num_classes: int = 37
    rnn_layers: int = 2
    dim_input: int = 512
    dim_model: int = 128
    max_seq_len: int = 40
    mask: bool = True
    return_feature: bool = False
    encode_value: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.max_seq_len + 1, self.dim_model,
                                  dtype=self.dtype)
        self.position_aware_module = PositionAwareLayer(
            self.dim_model, self.rnn_layers, dtype=self.dtype)
        if not self.return_feature:
            self.prediction = nn.Dense(self.num_classes - 1,
                                       dtype=self.dtype)

    def __call__(self, feat, out_enc, targets=None, valid_ratio=None,
                 train: bool = False):
        n, h, w, c_enc = out_enc.shape
        len_q = targets.shape[1] if targets is not None else self.max_seq_len
        pos_idx = jnp.broadcast_to(jnp.arange(len_q)[None], (n, len_q))
        query = self.embedding(pos_idx)
        pos_enc = self.position_aware_module(out_enc)
        # pos_enc's channel dim is dim_model — reshaping with c_enc only
        # works when the config keeps them equal
        key = pos_enc.reshape(n, h * w, pos_enc.shape[-1])
        value = (out_enc.reshape(n, h * w, c_enc) if self.encode_value
                 else feat.reshape(n, h * w, feat.shape[-1]))
        mask = _width_mask(valid_ratio, h, w) if self.mask else None
        attn = dot_product_attention(query, key, value, mask)
        if self.return_feature:
            return attn
        return self.prediction(attn)


class RobustScannerFusionLayer(nn.Module):
    """cat -> linear -> GLU (reference layers/robust_scanner_fusion_layer.py)."""
    dim_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0, x1):
        x = jnp.concatenate([x0, x1], axis=-1)
        x = nn.Dense(self.dim_model * 2, dtype=self.dtype,
                     name='linear_layer')(x)
        a, b = jnp.split(x, 2, axis=-1)
        return a * jax.nn.sigmoid(b)


@DECODERS.register_module()
class RobustScannerDecoder(nn.Module):
    IS_AUTOREGRESSIVE = True

    num_classes: int = 37
    dim_input: int = 512
    dim_model: int = 128
    max_seq_len: int = 40
    start_idx: int = 0
    mask: bool = True
    padding_idx: Optional[int] = None
    encode_value: bool = False
    hybrid_decoder: Optional[dict] = None
    position_decoder: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        hd = dict(self.hybrid_decoder or {})
        hd.pop('type', None)
        self.hybrid = SequenceAttentionDecoder(
            num_classes=self.num_classes, dim_input=self.dim_input,
            dim_model=self.dim_model, max_seq_len=self.max_seq_len,
            start_idx=self.start_idx, mask=self.mask,
            padding_idx=self.padding_idx, encode_value=self.encode_value,
            return_feature=True, dtype=self.dtype, **hd)
        pd = dict(self.position_decoder or {})
        pd.pop('type', None)
        self.position = PositionAttentionDecoder(
            num_classes=self.num_classes, dim_input=self.dim_input,
            dim_model=self.dim_model, max_seq_len=self.max_seq_len,
            mask=self.mask, encode_value=self.encode_value,
            return_feature=True, dtype=self.dtype, **pd)
        fusion_dim = self.dim_model if self.encode_value else self.dim_input
        self.fusion_module = RobustScannerFusionLayer(fusion_dim,
                                                      dtype=self.dtype)
        self.prediction = nn.Dense(self.num_classes - 1, dtype=self.dtype)

    def __call__(self, feat, out_enc, targets=None, valid_ratio=None,
                 train: bool = False):
        hybrid = self.hybrid(feat, out_enc, targets=targets,
                             valid_ratio=valid_ratio, train=train)
        position = self.position(feat, out_enc, targets=targets,
                                 valid_ratio=valid_ratio, train=train)
        return self.prediction(self.fusion_module(hybrid, position))

    # --- AR protocol -------------------------------------------------------
    def decode_init(self, feat, out_enc, valid_ratio=None):
        carry, h_static = self.hybrid.decode_init(feat, out_enc, valid_ratio)
        # position glimpse is query-static: compute all T steps once
        # (reference robust_scanner_decoder.py:141-143)
        pos_glimpse = self.position(feat, out_enc, targets=None,
                                    valid_ratio=valid_ratio, train=False)
        return carry, (h_static, pos_glimpse)

    def decode_step(self, token, t, carry, static):
        h_static, pos_glimpse = static
        hybrid_step, carry = self.hybrid.decode_step(token, t, carry,
                                                     h_static)
        pos_step = jax.lax.dynamic_index_in_dim(pos_glimpse, t, axis=1,
                                                keepdims=False)
        out = self.prediction(self.fusion_module(hybrid_step, pos_step))
        probs = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
        return probs, carry
