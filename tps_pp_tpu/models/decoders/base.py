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
        # steps in this phase satisfy t < end and step t attends slots
        # [0..t], so `end` slots suffice — end+1 would misalign every
        # bucket off the power-of-two tiling it was chosen for
        kv_limit = min(end, max_seq_len + 1) if kv_bucket > 0 else None

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


def beam_decode(apply_method, feat, out_enc, valid_ratio, *,
                max_seq_len: int, start_idx: int, beam_width: int = 5,
                length_norm: bool = False):
    """Vectorized beam search over the decode_init/decode_step protocol.

    Faithful to the reference's criterion (``sar_decoder_with_bs.py``):
    beams are ranked by the SUM of per-step softmax scores of their chosen
    tokens (not log-prob product), the first step expands a single beam,
    and the result is a (N, T, C') tensor holding the best beam's per-step
    scores at its token indexes — exactly what the codec's greedy argmax
    reads back out. Unlike the reference (batch-size-1 python priority
    queue, O(T^2) re-decoding) this runs any batch size in one jitted scan.
    """
    N = (feat.shape[0] if feat is not None else out_enc.shape[0])
    W = beam_width

    def tile(x):
        if x is None or not hasattr(x, 'ndim') or x.ndim == 0:
            return x
        return jnp.repeat(x, W, axis=0)

    feat_t = jax.tree.map(tile, feat)
    enc_t = jax.tree.map(tile, out_enc)
    vr_t = tile(valid_ratio) if valid_ratio is not None else None
    carry, static = apply_method('decode_init', feat_t, enc_t, vr_t)

    tokens0 = jnp.full((N * W,), start_idx, jnp.int32)
    # only beam 0 is live at step 0 (reference uses beam_width=1 there)
    beam_scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((W - 1,), -1e9)])[None],
        (N, 1))
    tok_hist = jnp.zeros((N, W, max_seq_len), jnp.int32)
    score_hist = jnp.zeros((N, W, max_seq_len), jnp.float32)

    def reindex(tree, parent):
        """Gather beam-major leaves (N*W, ...) along the beam axis."""
        def g(x):
            if not hasattr(x, 'ndim') or x.ndim == 0 or \
                    x.shape[0] != N * W:
                return x
            xw = x.reshape(N, W, *x.shape[1:])
            sel = jnp.take_along_axis(
                xw, parent.reshape(N, W, *([1] * (x.ndim - 1))), axis=1)
            return sel.reshape(N * W, *x.shape[1:])
        return jax.tree.map(g, tree)

    def step(state, t):
        tokens, carry, beam_scores, tok_hist, score_hist = state
        probs, carry = apply_method('decode_step', tokens, t, carry, static)
        C = probs.shape[-1]
        cand = beam_scores[:, :, None] + probs.reshape(N, W, C)
        flat = cand.reshape(N, W * C)
        rank = flat / (t + 1.0) if length_norm else flat
        top_i = jax.lax.top_k(rank, W)[1]                   # (N, W)
        top_v = jnp.take_along_axis(flat, top_i, axis=1)
        parent = top_i // C
        token = (top_i % C).astype(jnp.int32)
        step_score = jnp.take_along_axis(
            probs.reshape(N, W, C), parent[..., None], axis=1)
        step_score = jnp.take_along_axis(
            step_score.reshape(N, W, C), token[..., None], axis=-1)[..., 0]
        carry = reindex(carry, parent)
        tok_hist = jnp.take_along_axis(
            tok_hist, parent[..., None], axis=1)
        score_hist = jnp.take_along_axis(
            score_hist, parent[..., None], axis=1)
        tok_hist = tok_hist.at[:, :, t].set(token)
        score_hist = score_hist.at[:, :, t].set(step_score)
        return (token.reshape(N * W), carry, top_v, tok_hist,
                score_hist), ()

    state = (tokens0, carry, beam_scores, tok_hist, score_hist)
    (tokens, carry, beam_scores, tok_hist, score_hist), _ = jax.lax.scan(
        step, state, jnp.arange(max_seq_len))

    # best beam is column 0 of the (sorted) top_k
    best_tok = tok_hist[:, 0]                              # (N, T)
    best_score = score_hist[:, 0]
    C_out = jax.eval_shape(
        lambda c: apply_method('decode_step', tokens0, 0, c, static)[0],
        carry).shape[-1]
    out = jnp.zeros((N, max_seq_len, C_out), jnp.float32)
    out = out.at[jnp.arange(N)[:, None], jnp.arange(max_seq_len)[None, :],
                 best_tok].set(best_score)
    return out
