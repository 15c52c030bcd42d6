"""CRNN decoder — BiLSTM stack or 1x1 conv over a height-1 feature map.

Reference ``decoders/crnn_decoder.py:13-74``: feature (N, C, 1, W) ->
(N, W, num_classes); rnn path is two BidirectionalLSTMs (C->256->256,
256->256->num_classes). Non-autoregressive: test == train pass.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...registry import DECODERS
from ..layers import BidirectionalLSTM


@DECODERS.register_module()
class CRNNDecoder(nn.Module):
    IS_AUTOREGRESSIVE = False

    in_channels: int = 512
    num_classes: int = 37
    rnn_flag: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, out_enc=None, targets=None, valid_ratio=None,
                 train: bool = False):
        # feat: (N, H, W, C) NHWC with H*W columns collapsed like the
        # reference's rearrange 'b c h w -> b c (h w)' (crnn_decoder.py:50-52)
        if out_enc is not None and out_enc.ndim == 4:
            feat = out_enc
        n, h, w, c = feat.shape
        x = feat.reshape(n, h * w, c)
        if self.rnn_flag:
            x = BidirectionalLSTM(256, 256, dtype=self.dtype, name='rnn0')(x)
            x = BidirectionalLSTM(256, self.num_classes, dtype=self.dtype,
                                  name='rnn1')(x)
        else:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name='conv1x1')(x)
        return x
