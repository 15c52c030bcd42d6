"""NRTR transformer decoder (reference ``decoders/nrtr_decoder.py:14-177``).

Training: teacher-forced single pass with pad+causal self-attn mask
(nrtr_decoder.py:96-151). Inference: the reference greedily re-runs all
layers over the full 41-token prefix every step with no KV cache
(nrtr_decoder.py:153-177, the inference hot loop flagged in SURVEY §3.2).
Here decoding implements the generic decode_init/decode_step protocol with
per-layer KV caches — semantics preserving: pad positions beyond the current
step are masked out in the reference anyway, so the per-step distribution is
identical (verified in tests against a full-prefix recompute).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import DECODERS
from ..transformer import PositionalEncoding, TFDecoderLayer
from ..encoders.nrtr import sequence_mask
from .base import greedy_decode  # noqa: F401  (re-export)


@DECODERS.register_module()
class NRTRDecoder(nn.Module):
    IS_AUTOREGRESSIVE = True
    SUPPORTS_KV_LIMIT = True

    n_layers: int = 6
    d_embedding: int = 512
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_model: int = 512
    d_inner: int = 256
    n_position: int = 200
    dropout: float = 0.1
    num_classes: int = 93
    max_seq_len: int = 40
    start_idx: int = 1
    padding_idx: int = 92
    # fuse each layer's decode step into two Pallas kernels (TPU serving
    # path — the decode loop is op-launch-bound on this runtime, see
    # ops/pallas_decode.py). Requires qkv_bias=False (NRTR default) and
    # d_k == d_v.
    use_fused_step: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.trg_word_emb = nn.Embed(self.num_classes, self.d_embedding,
                                     dtype=self.dtype, name='trg_word_emb')
        self.position_enc = PositionalEncoding(self.d_embedding,
                                               self.n_position,
                                               dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        self.layer_stack = [
            TFDecoderLayer(self.d_model, self.d_inner, self.n_head, self.d_k,
                           self.d_v, self.dropout, dtype=self.dtype)
            for _ in range(self.n_layers)
        ]
        self.layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        # the reference never predicts <PAD>: output dim C-1
        # (nrtr_decoder.py:78-79)
        self.classifier = nn.Dense(self.num_classes - 1, dtype=self.dtype)

    def _embed(self, trg_seq, train: bool, offset: int = 0):
        x = self.trg_word_emb(trg_seq)
        x = self.position_enc(x, deterministic=not train, offset=offset)
        return self.drop(x, deterministic=not train)

    def __call__(self, feat, out_enc, targets=None, valid_ratio=None,
                 train: bool = False):
        """Teacher-forced pass. targets: (N, T) int; returns (N, T, C-1)."""
        src_mask = sequence_mask(valid_ratio, out_enc.shape[1])
        T = targets.shape[1]
        pad_mask = (targets != self.padding_idx)[:, None, :]   # (N,1,T)
        causal = jnp.tril(jnp.ones((T, T), dtype=bool))[None]  # (1,T,T)
        trg_mask = (pad_mask & causal).astype(jnp.float32)
        x = self._embed(targets, train)
        for layer in self.layer_stack:
            x = layer(x, out_enc, self_attn_mask=trg_mask,
                      dec_enc_attn_mask=src_mask, deterministic=not train)
        x = self.layer_norm(x)
        return self.classifier(x)

    # ---- generic AR protocol ------------------------------------------
    def decode_init(self, feat, out_enc, valid_ratio=None):
        """carry = per-layer self-attn KV caches (a tuple per layer, so XLA
        updates each buffer in place inside the decode loop); static =
        (enc K/V per layer, encoder valid mask)."""
        N = out_enc.shape[0]
        T = self.max_seq_len + 1
        enc_kvs = tuple(layer.project_enc_kv(out_enc)
                        for layer in self.layer_stack)
        caches = tuple(
            (jnp.zeros((N, self.n_head, T, self.d_k), self.dtype),
             jnp.zeros((N, self.n_head, T, self.d_v), self.dtype))
            for _ in range(self.n_layers))
        src_mask = sequence_mask(valid_ratio, out_enc.shape[1])
        return caches, (enc_kvs, src_mask)

    def decode_step(self, token, t, carry, static, kv_limit=None):
        """token: (N,) int32; t: scalar step. Returns (probs (N, C-1),
        carry).

        ``kv_limit`` (static int) bounds how much of the KV cache this step's
        attention reads — the bucketed decode passes the current bucket's
        upper bound so early steps don't stream the whole 41-slot cache from
        HBM (cache reads dominate decode time at large batch).
        """
        enc_kvs, src_mask = static
        if self.use_fused_step:
            return self._fused_decode_step(token, t, carry, static)
        x = self._embed(token[:, None], train=False, offset=t)
        T = self.max_seq_len + 1
        lim = T if kv_limit is None else min(kv_limit, T)
        # (1, 1, 1, lim) multiplicative mask for _attend (0 = masked)
        pos_mask = (jnp.arange(lim)[None, None, None, :] <= t).astype(
            jnp.float32)
        new_caches = []
        for layer, (ck, cv), (enc_k, enc_v) in zip(self.layer_stack, carry,
                                                   enc_kvs):
            # fused single-matmul QKV of norm1(x) (norm computed once)
            y = layer.norm1(x)
            q, k_t, v_t = layer.self_attn.qkv_fused(y)
            ck = jax.lax.dynamic_update_slice_in_dim(
                ck, k_t.astype(ck.dtype), t, axis=2)
            cv = jax.lax.dynamic_update_slice_in_dim(
                cv, v_t.astype(cv.dtype), t, axis=2)
            new_caches.append((ck, cv))
            sa = layer.self_attn._attend(q, ck[:, :, :lim], cv[:, :, :lim],
                                         pos_mask, True)
            x = x + layer.self_attn.finish(sa)
            y2 = layer.norm2(x)
            x = x + layer.enc_attn.call_cached(y2, enc_k, enc_v,
                                               mask=src_mask,
                                               deterministic=True)
            x = x + layer.mlp(layer.norm3(x), deterministic=True)
        x = self.layer_norm(x)
        logits = self.classifier(x[:, 0])
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs, tuple(new_caches)

    def _fused_decode_step(self, token, t, carry, static):
        """decode_step through the fused Pallas kernels
        (ops/pallas_decode.py) — same math, ~10x fewer ops per step."""
        from ...ops.pallas_decode import cross_ffn_step, self_attn_step
        enc_kvs, src_mask = static
        x = self._embed(token[:, None], train=False, offset=t)[:, 0]
        N = x.shape[0]
        if src_mask is None:
            src_mask = jnp.ones((N, enc_kvs[0][0].shape[2]), jnp.float32)
        new_caches = []
        for layer, (ck, cv), (enc_k, enc_v) in zip(self.layer_stack, carry,
                                                   enc_kvs):
            sa, ca = layer.self_attn, layer.enc_attn

            def k(m):
                return m.variables['params']['kernel']

            wqkv = jnp.concatenate([k(sa.linear_q), k(sa.linear_k),
                                    k(sa.linear_v)], axis=1)
            n1 = layer.norm1.variables['params']
            x, ck, cv = self_attn_step(
                x, ck, cv, t, wqkv, k(sa.fc), n1['scale'], n1['bias'])
            new_caches.append((ck, cv))
            n2 = layer.norm2.variables['params']
            n3 = layer.norm3.variables['params']
            m = layer.mlp.variables['params']
            x = cross_ffn_step(
                x, enc_k, enc_v, src_mask, k(ca.linear_q), k(ca.fc),
                n2['scale'], n2['bias'], m['w_1']['kernel'],
                m['w_1']['bias'], m['w_2']['kernel'], m['w_2']['bias'],
                n3['scale'], n3['bias'])
        x = self.layer_norm(x[:, None])
        logits = self.classifier(x[:, 0])
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs, tuple(new_caches)


# SATRN's decoder config name (reference configs/_base_/recog_models/
# satrn.py uses type='TFDecoder' for the same transformer decoder)
DECODERS.register_module(name='TFDecoder', module=NRTRDecoder)
# the fork's generic transformer decoder (reference decoders/
# transformer_frame.py TFCommonDecoder) — same autoregressive transformer
# decode; its Mask_MultiHeadAttention twist depends on modules the reference
# deleted (SURVEY §2.11), so the standard attention path is used
DECODERS.register_module(name='TFCommonDecoder', module=NRTRDecoder)
