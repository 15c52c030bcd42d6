"""SAR holistic LSTM encoder (reference ``encoders/sar_encoder.py:14-111``).

Height max-pool -> 2-layer LSTM (or GRU when ``enc_gru``, sar_encoder.py:
62-69) over the width axis -> hidden state at the valid_ratio-clipped last
column -> linear. Both RNNs are the torch-gate scans from layers.py so
weights convert 1:1.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...registry import ENCODERS
from ..layers import TorchGRUCellScan, TorchLSTMCellScan


@ENCODERS.register_module()
class SAREncoder(nn.Module):
    enc_bi_rnn: bool = False
    enc_do_rnn: float = 0.0
    enc_gru: bool = False
    d_model: int = 512
    d_enc: int = 512
    mask: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, valid_ratio=None, train: bool = False):
        cell = TorchGRUCellScan if self.enc_gru else TorchLSTMCellScan
        # feat: (N, H, W, C) -> max over H -> (N, W, C)
        x = jnp.max(feat, axis=1)
        for i in range(2):
            fwd = cell(self.d_enc, dtype=self.dtype,
                       name=f'rnn{i}_fwd')(x)
            if self.enc_bi_rnn:
                bwd = cell(self.d_enc, reverse=True,
                           dtype=self.dtype,
                           name=f'rnn{i}_bwd')(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
            if i == 0 and self.enc_do_rnn:
                # torch nn.LSTM(num_layers=2, dropout=enc_do_rnn)
                # applies dropout to the layer-0 output in training
                # (reference sar_encoder.py:55-65)
                x = nn.Dropout(self.enc_do_rnn)(
                    x, deterministic=not train)
        T = x.shape[1]
        if self.mask and valid_ratio is not None:
            # hidden state at the last valid column (sar_encoder.py:99-105)
            valid_step = jnp.minimum(
                T, jnp.ceil(T * valid_ratio)).astype(jnp.int32) - 1
            holistic = jnp.take_along_axis(
                x, valid_step[:, None, None], axis=1)[:, 0]
        else:
            holistic = x[:, -1]
        return nn.Dense(x.shape[-1], dtype=self.dtype,
                        name='linear')(holistic)
