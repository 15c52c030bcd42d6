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
                  max_seq_len: int, start_idx: int):
    """apply_method(name, *args) dispatches to the bound decoder module.

    Returns (N, max_seq_len, C') per-step softmax probabilities — the same
    stacked outputs the reference's greedy loops produce.
    """
    N = (feat.shape[0] if feat is not None else out_enc.shape[0])
    carry, static = apply_method('decode_init', feat, out_enc, valid_ratio)

    def step(sc, t):
        token, carry = sc
        probs, carry = apply_method('decode_step', token, t, carry, static)
        nxt = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        return (nxt, carry), probs

    init = (jnp.full((N,), start_idx, dtype=jnp.int32), carry)
    _, probs = jax.lax.scan(step, init, jnp.arange(max_seq_len))
    return jnp.swapaxes(probs, 0, 1)
