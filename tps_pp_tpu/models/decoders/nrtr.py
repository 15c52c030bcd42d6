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
    # 'int8' stores the self-attn KV caches and the precomputed encoder K/V
    # int8-quantized (per-slot / per-head absmax scales): decode at large
    # batch is HBM-bound on exactly these tensors (~600MB/step at B=512
    # bf16), so this halves decode cache traffic. Greedy argmax parity vs
    # the fp32 reference is asserted in tests/test_reference_parity.py.
    kv_dtype: str = 'bfloat16'
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
        # torch nn.Embedding(padding_idx=...) pins the pad row at zero
        # (zero init + no grads); emulate by zeroing at lookup — otherwise
        # from-scratch training leaves the pad embedding at its random init
        x = jnp.where((trg_seq == self.padding_idx)[..., None], 0.0, x)
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

    # ---- int8 KV helpers ------------------------------------------------
    @staticmethod
    def _quantize(x, axes):
        """absmax int8 quantization; returns (int8 values, f32 scales with
        the reduced axes kept at size 1)."""
        scale = (jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes,
                         keepdims=True) / 127.0 + 1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
        return q, scale

    def _attend_q8(self, q, k8, k_scale, v8, v_scale, mask):
        """Scaled-dot attention over int8 K/V. k_scale/v_scale broadcast to
        (N, H, 1, K); the K scale folds into the logits, the V scale into
        the softmax weights, so the big tensors stay int8 end to end."""
        scale = 1.0 / (self.d_k ** 0.5)
        attn = jnp.einsum('nhqd,nhkd->nhqk', (q * scale),
                          k8.astype(q.dtype),
                          preferred_element_type=jnp.float32)
        attn = attn * jnp.swapaxes(k_scale, 2, 3)[:, :, :1]
        if mask is not None:
            attn = jnp.where(mask == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        aw = (attn * jnp.swapaxes(v_scale, 2, 3)[:, :, :1]).astype(q.dtype)
        out = jnp.einsum('nhqk,nhkd->nhqd', aw, v8.astype(q.dtype),
                         preferred_element_type=jnp.float32).astype(q.dtype)
        N, _, Tq, _ = out.shape
        return out.transpose(0, 2, 1, 3).reshape(N, Tq,
                                                 self.n_head * self.d_v)

    # ---- generic AR protocol ------------------------------------------
    def decode_init(self, feat, out_enc, valid_ratio=None):
        """carry = per-layer self-attn KV caches (a tuple per layer, so XLA
        updates each buffer in place inside the decode loop); static =
        (enc K/V per layer, encoder valid mask)."""
        N = out_enc.shape[0]
        T = self.max_seq_len + 1
        src_mask = sequence_mask(valid_ratio, out_enc.shape[1])
        if self.kv_dtype == 'int8':
            enc_kvs = []
            for layer in self.layer_stack:
                k, v = layer.project_enc_kv(out_enc)
                k8, ks = self._quantize(k, (2, 3))   # per (N, H) scale
                v8, vs = self._quantize(v, (2, 3))
                enc_kvs.append((k8, ks, v8, vs))
            caches = tuple(
                (jnp.zeros((N, self.n_head, T, self.d_k), jnp.int8),
                 jnp.zeros((N, self.n_head, T, 1), jnp.float32),
                 jnp.zeros((N, self.n_head, T, self.d_v), jnp.int8),
                 jnp.zeros((N, self.n_head, T, 1), jnp.float32))
                for _ in range(self.n_layers))
            return caches, (tuple(enc_kvs), src_mask)
        enc_kvs = tuple(layer.project_enc_kv(out_enc)
                        for layer in self.layer_stack)
        caches = tuple(
            (jnp.zeros((N, self.n_head, T, self.d_k), self.dtype),
             jnp.zeros((N, self.n_head, T, self.d_v), self.dtype))
            for _ in range(self.n_layers))
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
            # the fused step kernels unpack bf16 2-tuple caches;
            # decode_init's int8 caches are 4-tuples (values + scales)
            assert self.kv_dtype != 'int8', (
                'use_fused_step does not support kv_dtype=int8')
            return self._fused_decode_step(token, t, carry, static)
        if self.kv_dtype == 'int8':
            return self._decode_step_q8(token, t, carry, static, kv_limit)
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

    def _decode_step_q8(self, token, t, carry, static, kv_limit=None):
        """decode_step over int8 KV caches + int8 encoder K/V."""
        enc_kvs, src_mask = static
        x = self._embed(token[:, None], train=False, offset=t)
        T = self.max_seq_len + 1
        lim = T if kv_limit is None else min(kv_limit, T)
        pos_mask = (jnp.arange(lim)[None, None, None, :] <= t).astype(
            jnp.float32)
        if src_mask is not None:
            cross_mask = src_mask[:, None, None]
        else:
            cross_mask = None
        new_caches = []
        for layer, cache, enc in zip(self.layer_stack, carry, enc_kvs):
            ck, cks, cv, cvs = cache
            ek8, eks, ev8, evs = enc
            y = layer.norm1(x)
            q, k_t, v_t = layer.self_attn.qkv_fused(y)
            k8, ks = self._quantize(k_t, (3,))
            v8, vs = self._quantize(v_t, (3,))
            ck = jax.lax.dynamic_update_slice_in_dim(ck, k8, t, axis=2)
            cks = jax.lax.dynamic_update_slice_in_dim(cks, ks, t, axis=2)
            cv = jax.lax.dynamic_update_slice_in_dim(cv, v8, t, axis=2)
            cvs = jax.lax.dynamic_update_slice_in_dim(cvs, vs, t, axis=2)
            new_caches.append((ck, cks, cv, cvs))
            sa = self._attend_q8(q, ck[:, :, :lim], cks[:, :, :lim],
                                 cv[:, :, :lim], cvs[:, :, :lim], pos_mask)
            x = x + layer.self_attn.finish(sa)
            y2 = layer.norm2(x)
            q2 = layer.enc_attn._split(layer.enc_attn.linear_q(y2),
                                       layer.enc_attn.d_k)
            ca = self._attend_q8(q2, ek8, eks, ev8, evs, cross_mask)
            x = x + layer.enc_attn.finish(ca)
            x = x + layer.mlp(layer.norm3(x), deterministic=True)
        x = self.layer_norm(x)
        logits = self.classifier(x[:, 0])
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs, tuple(new_caches)

    def fused_full_decode(self, feat, out_enc, valid_ratio=None,
                          enc_dtype: str = 'int8', end_idx: int = None):
        """All max_seq_len greedy steps in ONE pallas kernel
        (ops/pallas_full_decode.py): weights, encoder K/V and the KV caches
        stay VMEM-resident for the whole loop. Returns (N, S, C-1) per-step
        softmax probabilities — same contract as greedy_decode.

        enc_dtype='bfloat16' keeps the encoder K/V unquantized (greedy
        argmax-identical to the XLA `steps` path); 'int8' halves its VMEM
        footprint at the cost of argmax flips on quantization near-ties."""
        from ...ops.pallas_full_decode import full_greedy_decode

        enc_k, enc_v = [], []
        for layer in self.layer_stack:
            k, v = layer.project_enc_kv(out_enc)
            enc_k.append(k)
            enc_v.append(v)
        enc_k = jnp.stack(enc_k)
        enc_v = jnp.stack(enc_v)
        N, TE = out_enc.shape[0], out_enc.shape[1]
        src_mask = sequence_mask(valid_ratio, TE)
        if src_mask is None:
            src_mask = jnp.ones((N, TE), jnp.float32)

        def kp(m):
            return m.variables['params']['kernel']

        def bp(m):
            return m.variables['params']['bias']

        def lnp(m):
            p = m.variables['params']
            return p['scale'][None, :], p['bias'][None, :]

        stacks = {k: [] for k in ('ln1_s', 'ln1_b', 'ln2_s', 'ln2_b',
                                  'ln3_s', 'ln3_b', 'wqkv', 'wfc1', 'wq2',
                                  'wfc2', 'w1', 'b1', 'w2', 'b2')}
        for layer in self.layer_stack:
            for i, nm in enumerate(('ln1', 'ln2', 'ln3')):
                s, b = lnp((layer.norm1, layer.norm2, layer.norm3)[i])
                stacks[f'{nm}_s'].append(s)
                stacks[f'{nm}_b'].append(b)
            sa = layer.self_attn
            stacks['wqkv'].append(jnp.concatenate(
                [kp(sa.linear_q), kp(sa.linear_k), kp(sa.linear_v)], axis=1))
            stacks['wfc1'].append(kp(sa.fc))
            stacks['wq2'].append(kp(layer.enc_attn.linear_q))
            stacks['wfc2'].append(kp(layer.enc_attn.fc))
            mlp = layer.mlp.variables['params']  # w_1/w_2 are compact
            stacks['w1'].append(mlp['w_1']['kernel'])
            stacks['b1'].append(mlp['w_1']['bias'][None, :])
            stacks['w2'].append(mlp['w_2']['kernel'])
            stacks['b2'].append(mlp['w_2']['bias'][None, :])
        weights = {k: jnp.stack(v) for k, v in stacks.items()}
        lnf_s, lnf_b = lnp(self.layer_norm)
        weights['lnf_s'] = lnf_s
        weights['lnf_b'] = lnf_b

        from ..transformer import sinusoid_position_table
        emb = self.trg_word_emb.variables['params']['embedding']
        C = emb.shape[0]
        CP = ((max(C, 128) + 127) // 128) * 128
        D = emb.shape[1]
        weights['embed'] = jnp.zeros((CP, D), emb.dtype).at[:C].set(emb)
        wcls = kp(self.classifier)
        bcls = bp(self.classifier)
        weights['wcls'] = jnp.zeros((D, CP), wcls.dtype).at[
            :, :wcls.shape[1]].set(wcls)
        weights['bcls'] = jnp.full((1, CP), -1e9, jnp.float32).at[
            0, :bcls.shape[0]].set(bcls.astype(jnp.float32))
        weights['pe'] = jnp.asarray(
            sinusoid_position_table(self.n_position, D)[
                0, :self.max_seq_len])
        return full_greedy_decode(
            enc_k, enc_v, src_mask, weights, S=self.max_seq_len,
            start_idx=self.start_idx, num_classes=self.num_classes - 1,
            enc_dtype=enc_dtype, end_idx=end_idx)

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
