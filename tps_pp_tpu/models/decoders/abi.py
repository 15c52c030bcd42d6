"""ABINet decoders: vision (position attention over a mini U-Net key map)
and language (BCN spell-corrector).

* ``ABIVisionDecoder`` — reference ``decoders/abinet_vision_decoder.py:12-170``:
  4-down/4-up mini U-Net over the feature builds the attention key map;
  queries are projected positional encodings of T zero vectors;
  attn = softmax(q k^T / sqrt(E)); glimpses -> logits.
* ``ABILanguageDecoder`` — reference ``decoders/abinet_language_decoder.py:
  15-181``: projects softmax token distributions (optionally detached),
  n_layers of cross-attention from positional queries with a diagonal
  location mask (a position may not attend to itself, :150-165) and a
  length-based key padding mask computed from the first EOS (:135-148).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import DECODERS
from ..layers import ConvModule, upsample_nearest
from ..transformer import MultiHeadAttention, PositionalEncoding


@DECODERS.register_module()
class ABIVisionDecoder(nn.Module):
    IS_AUTOREGRESSIVE = False

    in_channels: int = 512
    num_channels: int = 64
    attn_height: int = 8
    attn_width: int = 32
    max_seq_len: int = 40
    num_chars: int = 90
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, out_enc=None, targets=None, valid_ratio=None,
                 train: bool = False):
        # feat: (N, H, W, E)
        N, H, W, E = feat.shape
        v = feat
        # mini U-Net on k (strides (1,2),(2,2),(2,2),(2,2))
        k = feat
        feats = []
        for i, s in enumerate([(1, 2), (2, 2), (2, 2), (2, 2)]):
            k = ConvModule(self.num_channels, 3, stride=s, padding=1,
                           use_norm=True, dtype=self.dtype,
                           name=f'k_enc{i}')(k, train=train)
            feats.append(k)
        for i in range(3):
            k = upsample_nearest(k, 2)
            k = ConvModule(self.num_channels, 3, stride=1, padding=1,
                           use_norm=True, dtype=self.dtype,
                           name=f'k_dec{i}')(k, train=train)
            k = k + feats[2 - i]
        # final: upsample to (H, W) then conv to E channels
        k = jax.image.resize(k, (N, H, W, k.shape[-1]), method='nearest')
        k = ConvModule(self.in_channels, 3, stride=1, padding=1,
                       use_norm=True, dtype=self.dtype,
                       name='k_dec3')(k, train=train)

        zeros = jnp.zeros((N, self.max_seq_len, E), self.dtype)
        q = PositionalEncoding(E, self.max_seq_len, dtype=self.dtype,
                               name='pos_encoder')(zeros)
        q = nn.Dense(E, dtype=self.dtype, name='project')(q)

        attn = jnp.einsum('nte,nhwe->nthw', q, k,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(N, self.max_seq_len, H * W) / (E ** 0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn_vecs = jnp.einsum(
            'ntl,nle->nte', attn.astype(self.dtype),
            v.reshape(N, H * W, E),
            preferred_element_type=jnp.float32).astype(self.dtype)
        logits = nn.Dense(self.num_chars, dtype=self.dtype,
                          name='cls')(attn_vecs)
        return {'feature': attn_vecs, 'logits': logits,
                'attn_scores': attn.reshape(N, -1, H, W)}


@DECODERS.register_module()
class ABILanguageDecoder(nn.Module):
    IS_AUTOREGRESSIVE = False

    d_model: int = 512
    n_head: int = 8
    d_inner: int = 2048
    n_layers: int = 4
    max_seq_len: int = 40
    dropout: float = 0.1
    detach_tokens: bool = True
    num_chars: int = 90
    use_self_attn: bool = False
    pad_idx: int = 0
    dtype: Any = jnp.float32

    def _get_length(self, logits):
        """First index of EOS/pad + 1, else full length
        (reference :135-148), clamped to [2, T]."""
        is_end = (jnp.argmax(logits, axis=-1) == self.pad_idx)
        any_end = jnp.any(is_end, axis=1)
        first = jnp.argmax(is_end, axis=1) + 1
        length = jnp.where(any_end, first, logits.shape[1])
        return jnp.clip(length, 2, self.max_seq_len)

    @nn.compact
    def __call__(self, feat, logits, targets=None, valid_ratio=None,
                 train: bool = False):
        # the reference BCN's optional self-attention operation is not
        # implemented; fail loudly rather than build a different model
        assert not self.use_self_attn, 'use_self_attn is not implemented'
        N, T, _ = logits.shape
        lengths = self._get_length(logits)
        tokens = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if self.detach_tokens:
            tokens = jax.lax.stop_gradient(tokens)
        embed = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                         name='proj')(tokens.astype(self.dtype))
        embed = PositionalEncoding(self.d_model, self.max_seq_len,
                                   dropout=0.1, dtype=self.dtype,
                                   name='token_encoder')(
            embed, deterministic=not train)
        zeros = jnp.zeros((N, T, self.d_model), self.dtype)
        query = PositionalEncoding(self.d_model, self.max_seq_len,
                                   dtype=self.dtype,
                                   name='pos_encoder')(zeros)

        # combined mask: no self-position (diagonal) + no padded keys;
        # convention: 0 = masked
        not_pad = (jnp.arange(T)[None, :] < lengths[:, None])
        loc = (1 - jnp.eye(T))[None]                     # (1, T, T)
        mask = loc * not_pad[:, None, :]                 # (N, T, T)

        d_k = self.d_model // self.n_head
        x = query
        for i in range(self.n_layers):
            attn = MultiHeadAttention(self.n_head, self.d_model, d_k, d_k,
                                      self.dropout, qkv_bias=True,
                                      dtype=self.dtype, name=f'cross{i}')
            x = x + attn(x, embed, embed, mask=mask,
                         deterministic=not train)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f'norm{i}_1')(x)
            y = nn.Dense(self.d_inner, dtype=self.dtype,
                         name=f'ffn{i}_fc1')(x)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout)(y, deterministic=not train)
            y = nn.Dense(self.d_model, dtype=self.dtype,
                         name=f'ffn{i}_fc2')(y)
            y = nn.Dropout(self.dropout)(y, deterministic=not train)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f'norm{i}_2')(x + y)

        out_logits = nn.Dense(self.num_chars, dtype=self.dtype,
                              name='cls')(x)
        return {'feature': x, 'logits': out_logits}
