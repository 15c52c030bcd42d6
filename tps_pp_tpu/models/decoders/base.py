"""Decoder protocol + generic greedy decode.

Every decoder implements
``__call__(feat, out_enc, targets=None, valid_ratio=None, train=False)``
returning (N, T, C') logits (the reference's forward_train contract,
base_decoder.py). Autoregressive decoders additionally implement

  * ``decode_init(feat, out_enc, valid_ratio) -> (carry, static)``
  * ``decode_step(token, t, carry, static) -> (probs, carry)``

and set ``IS_AUTOREGRESSIVE = True``; ``greedy_decode`` drives them through
one ``lax.scan`` (the TPU replacement for the reference's
re-run-the-whole-decoder-per-step greedy loops, e.g. nrtr_decoder.py:153-177
and sar_decoder.py:202-255 — semantics preserved, O(T) instead of O(T^2)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy_decode(apply_method, feat, out_enc, valid_ratio, *,
                  max_seq_len: int, start_idx: int, end_idx=None,
                  kv_bucket: int = 0):
    """apply_method(name, *args) dispatches to the bound decoder module.

    Returns (N, max_seq_len, C') per-step softmax probabilities — the same
    stacked outputs the reference's greedy loops produce.

    With ``end_idx`` given, decoding runs under ``lax.while_loop`` and exits
    as soon as every row has emitted EOS — semantics-preserving (the codecs
    stop reading at the first EOS, reference attn.py:132-138, so steps after
    it are dead) but typically ~4x fewer steps than the reference's fixed
    40-iteration loop on real text.

    With ``kv_bucket`` > 0 (decoders advertising SUPPORTS_KV_LIMIT),
    decoding is split into bucket phases: steps in [0, 8) read only the
    first 8 KV-cache slots, steps in [8, 16) the first 16, etc. Cache
    streaming from HBM dominates decode at large batch, and early steps
    don't need the tail — ~1.7x less cache traffic on a full 40-step
    decode, more when early exit fires first.
    """
    N = (feat.shape[0] if feat is not None else out_enc.shape[0])
    carry, static = apply_method('decode_init', feat, out_enc, valid_ratio)
    tokens0 = jnp.full((N,), start_idx, dtype=jnp.int32)

    if end_idx is None and kv_bucket == 0:
        def step(sc, t):
            token, carry = sc
            probs, carry = apply_method('decode_step', token, t, carry,
                                        static)
            nxt = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            return (nxt, carry), probs

        _, probs = jax.lax.scan(step, (tokens0, carry),
                                jnp.arange(max_seq_len))
        return jnp.swapaxes(probs, 0, 1)

    # bucketed / early-exit variant: fill a preallocated buffer, stopping as
    # soon as all rows hit EOS (if end_idx is set)
    probs_shape = jax.eval_shape(
        lambda c: apply_method('decode_step', tokens0, 0, c, static)[0],
        carry)
    buf = jnp.zeros((max_seq_len,) + probs_shape.shape, jnp.float32)

    if kv_bucket > 0:
        bounds = list(range(kv_bucket, max_seq_len, kv_bucket))
        bounds.append(max_seq_len)
    else:
        bounds = [max_seq_len]

    state = (jnp.zeros((), jnp.int32), tokens0, carry,
             jnp.zeros((N,), bool), buf)
    for end in bounds:
        kv_limit = min(end + 1, max_seq_len + 1) if kv_bucket > 0 else None

        def cond(s, _end=end):
            t, _, _, done, _ = s
            in_range = t < _end
            if end_idx is None:
                return in_range
            return jnp.logical_and(in_range, ~jnp.all(done))

        def body(s, _lim=kv_limit):
            t, token, carry, done, buf = s
            if _lim is None:
                probs, carry = apply_method('decode_step', token, t, carry,
                                            static)
            else:
                probs, carry = apply_method('decode_step', token, t, carry,
                                            static, _lim)
            buf = jax.lax.dynamic_update_index_in_dim(buf, probs, t, axis=0)
            nxt = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            if end_idx is not None:
                done = done | (nxt == end_idx)
            return t + 1, nxt, carry, done, buf

        state = jax.lax.while_loop(cond, body, state)
    return jnp.swapaxes(state[4], 0, 1)
