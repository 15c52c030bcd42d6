"""Whole-decode Pallas kernel: all 40 greedy steps in ONE kernel launch.

Round-1 measurements showed the NRTR decode loop is op-cost bound: each XLA
op in the step body carries ~15-50us of fixed cost (weight re-fetch from
HBM, pipeline fill), so 40 steps x ~150 ops dominate inference at ~68ms for
batch 512 — while the actual FLOPs are ~1 TFLOP. The per-step fused kernels
(ops/pallas_decode.py) could not win because they round-trip the KV cache
blocks HBM->VMEM->HBM every step.

This kernel removes both costs: for each batch block it keeps EVERYTHING
resident in VMEM for the entire 40-step loop —
  * all 6 layers' weights (~31MB bf16),
  * the precomputed encoder K/V for the block (~25MB at bt=32),
  * the self-attention KV caches (scratch, ~16MB),
and runs embed -> 6x(self-attn + cross-attn + FFN) -> LN -> classifier ->
softmax -> argmax -> next-token feedback inside a fori_loop. HBM is touched
once per block (weights + enc KV in, probs out).

Numerics match the XLA decode path (f32 accumulation, bf16 matmuls,
polynomial erf GELU); greedy argmax parity is asserted in
tests/test_pallas_full_decode.py against the unfused path and transitively
(tests/test_reference_parity.py) against the torch reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import _erf

NEG_INF = -1e9


def _ln_norm(x, eps=1e-5):
    """Scale/bias-free LayerNorm: the affine part is folded into the
    adjacent matmul weights host-side (see full_greedy_decode), which
    removes ~19 f32 vector-op chains from every decode step."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


def _attend_allheads(q, kv, mask3, mk, mv, H, HD):
    """ALL heads' attention in two batched 3D dot_generals.

    The per-head loop this replaces issued 16 tiny MXU dots + 8 softmax
    chains per attention; at (bt=64, DK=64) sizes the kernel is MXU-issue
    bound, not FLOP bound, so op count is the cost model. Instead keep K
    and V with every head in the lane axis (kv (bt, Tk, 2HD): K lanes
    [:HD], V lanes [HD:], head h at lanes [h*DK,(h+1)*DK) of each half)
    and make the head separation block-diagonal:

      Qbd (bt, H, HD) = broadcast(q) * mk, mk[h, c] = 1 iff lane c belongs
      to head h — so batched dot with K over the HD lanes yields every
      head's scores at once (off-head lanes contribute exact zeros).

    q (bt, HD) f32; kv (bt, Tk, 2HD) bf16; mask3 (bt, H, Tk) bool;
    mk/mv (H, HD) f32 own-head lane masks — they also carry the int8
    per-(layer, head) dequant scales (K scale folded into the query mask,
    V scale into the output mask). Returns (bt, HD) f32 in the standard
    concatenated-heads layout (mv re-selects each head's own lanes from
    the over-wide value dot, summing out the H axis)."""
    bt = q.shape[0]
    qbd = (jax.lax.broadcast_in_dim(q, (bt, H, HD), (0, 2)) * mk
           ).astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        qbd, kv[:, :, :HD], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # (bt, H, Tk)
    scores = jnp.where(mask3, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    out3 = jax.lax.dot_general(
        w, kv[:, :, HD:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # (bt, H, HD)
    return jnp.sum(out3 * mv, axis=1)                       # (bt, HD)


def _full_decode_kernel(mask_ref, embed_ref, pe_ref,
                        wqkv_ref, bqkv_ref, wfc1_ref,
                        wq2_ref, bq2_ref, wfc2_ref,
                        w1_ref, b1_ref, w2_ref, b2_ref,
                        wcls_ref, bcls_ref,
                        maskk_ref, maskv_ref, enc_kv_ref,
                        probs_ref, ckv_ref, enc_vmem=None, dma_sem=None, *,
                        L, H, T, TE, DK, S, SP, CP, start_idx, num_classes,
                        enc_quant=True, ablate='', end_idx=None):
    bt = mask_ref.shape[0]
    D = embed_ref.shape[1]
    HD = H * DK
    # encoder validity, broadcast over the head axis once
    cross3 = jax.lax.broadcast_in_dim(
        mask_ref[:], (bt, H, TE), (0, 2)) > 0               # (bt, H, TE)
    if not enc_quant:
        # bf16 enc-KV lives in HBM (pallas would double-buffer a VMEM grid
        # input — 2x the dominant tenant); copy this block's slice once via
        # manual DMA. Layout (N, L, TE, 2HD): the batch slice is a
        # leading-dim range, contiguous for the DMA engine.
        blk = pl.program_id(0)
        dma = pltpu.make_async_copy(
            enc_kv_ref.at[pl.ds(blk * bt, bt)], enc_vmem, dma_sem)
        dma.start()
    # zero the caches (scratch is uninitialized)
    ckv_ref[...] = jnp.zeros_like(ckv_ref)
    if not enc_quant:
        dma.wait()

    cls_iota = jax.lax.broadcasted_iota(jnp.int32, (bt, CP), 1)
    onehot0 = (cls_iota == start_idx).astype(jnp.float32)
    # self-attention own-head lane mask (no scales): mk[h, c] = c//DK == h
    hm = (jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1) // DK ==
          jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)
          ).astype(jnp.float32)

    def step(t, onehot):
        x = jnp.dot(onehot.astype(jnp.bfloat16), embed_ref[:],
                    preferred_element_type=jnp.float32)      # (bt, D)
        # Mosaic lowers no dynamic_slice on values: fetch the PE row via a
        # one-hot contraction over the S axis instead
        s_onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) == t
                    ).astype(jnp.float32)
        pe_t = jnp.dot(s_onehot, pe_ref[:].astype(jnp.float32))   # (1, D)
        x = x + pe_t
        key3 = jax.lax.broadcasted_iota(jnp.int32, (bt, H, T), 2) <= t
        CH = 8  # cache writes touch only the 8-slot chunk containing step
        # t, via an 8-sublane-ALIGNED dynamic-slice store (Mosaic accepts
        # tile-aligned ds stores; full-cache where-writes were ~38MB of
        # VMEM traffic per step). T and SP are padded to multiples of 8.
        chunk = t // CH
        slot_c = (jax.lax.broadcasted_iota(
            jnp.int32, (bt, CH, 2 * HD), 1) == t % CH)
        for l in range(L):
            # ---- self attention ----
            y = _ln_norm(x)
            qkv = jnp.dot(y.astype(jnp.bfloat16), wqkv_ref[l],
                          preferred_element_type=jnp.float32) + bqkv_ref[l]
            # one cache write for ALL heads: qkv's K|V columns are already
            # the cache's (2HD) lane layout
            kv3 = jax.lax.broadcast_in_dim(qkv[:, HD:], (bt, CH, 2 * HD),
                                           (0, 2))
            blkc = ckv_ref[l, :, pl.ds(chunk * CH, CH), :]
            ckv_ref[l, :, pl.ds(chunk * CH, CH), :] = jnp.where(
                slot_c, kv3, blkc.astype(jnp.float32)).astype(ckv_ref.dtype)
            if 'self' in ablate:
                sa = qkv[:, :HD]
            else:
                sa = _attend_allheads(qkv[:, :HD], ckv_ref[l], key3,
                                      hm, hm, H, HD)
            x = x + jnp.dot(sa.astype(jnp.bfloat16), wfc1_ref[l],
                            preferred_element_type=jnp.float32)
            # ---- cross attention ----
            y2 = _ln_norm(x)
            q2 = jnp.dot(y2.astype(jnp.bfloat16), wq2_ref[l],
                         preferred_element_type=jnp.float32) + bq2_ref[l]
            if 'cross' in ablate:
                ca = q2
            else:
                kvx = (enc_kv_ref[l].astype(jnp.bfloat16) if enc_quant
                       else enc_vmem[:, l])
                ca = _attend_allheads(q2, kvx, cross3,
                                      maskk_ref[l], maskv_ref[l], H, HD)
            x = x + jnp.dot(ca.astype(jnp.bfloat16), wfc2_ref[l],
                            preferred_element_type=jnp.float32)
            # ---- FFN ----
            y3 = _ln_norm(x)
            h1 = jnp.dot(y3.astype(jnp.bfloat16), w1_ref[l],
                         preferred_element_type=jnp.float32) + b1_ref[l]
            h1 = 0.5 * h1 * (1.0 + _erf(h1 * 0.7071067811865476))
            h2 = jnp.dot(h1.astype(jnp.bfloat16), w2_ref[l],
                         preferred_element_type=jnp.float32) + b2_ref[l]
            x = x + h2
        # the decoder's FINAL LayerNorm uses eps=1e-6 (reference
        # nrtr_decoder.py:76 sets it explicitly; per-layer norms keep the
        # torch default 1e-5). Its scale/bias are folded into wcls/bcls.
        xl = _ln_norm(x, eps=1e-6)
        logits = jnp.dot(xl.astype(jnp.bfloat16), wcls_ref[:],
                         preferred_element_type=jnp.float32) + bcls_ref[:]
        logits = jnp.where(cls_iota < num_classes, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)       # (bt, CP)
        # write this step's probs into its 8-step chunk (aligned ds store)
        s_slot = (jax.lax.broadcasted_iota(jnp.int32, (bt, CH, CP), 1)
                  == t % CH)
        p3 = jax.lax.broadcast_in_dim(probs, (bt, CH, CP), (0, 2))
        pblk = probs_ref[:, pl.ds(chunk * CH, CH), :]
        probs_ref[:, pl.ds(chunk * CH, CH), :] = jnp.where(
            s_slot, p3, pblk.astype(jnp.float32)).astype(probs_ref.dtype)
        nxt = jnp.argmax(probs, axis=-1)
        return (cls_iota == nxt[:, None]).astype(jnp.float32)

    if end_idx is None:
        jax.lax.fori_loop(0, S, step, onehot0)
    else:
        # early exit once EVERY row has emitted EOS — the same contract as
        # greedy_decode's early_exit (the codec ignores everything after
        # the first EOS, so skipped steps are unobservable). Skipped steps
        # read back as the zeros written here (deterministic), and padded
        # all-invalid-mask rows count as already finished so they cannot
        # keep the block alive.
        probs_ref[...] = jnp.zeros_like(probs_ref)
        eos_col = (cls_iota == end_idx).astype(jnp.float32)   # (bt, CP)
        row_valid = jnp.max(mask_ref[:], axis=-1, keepdims=True) > 0
        seen0 = jnp.where(row_valid, 0.0, eos_col)

        def cond(carry):
            t, _, seen = carry
            done = jnp.min(jnp.sum(seen * eos_col, axis=-1))
            return jnp.logical_and(t < S, done < 0.5)

        def body(carry):
            t, onehot, seen = carry
            nxt = step(t, onehot)
            return t + 1, nxt, jnp.maximum(seen, nxt)

        jax.lax.while_loop(cond, body, (0, onehot0, seen0))


def full_greedy_decode(enc_k, enc_v, src_mask, weights, *, S: int,
                       start_idx: int, num_classes: int, bt: int = None,
                       interpret: bool = False, ablate: str = '',
                       enc_dtype: str = 'int8', end_idx: int = None):
    """Whole-greedy-decode kernel entry — resolves the ``TPS_FUSED_BT``
    batch-block env knob and validates the packed-weights layout OUTSIDE
    the jitted core (so the knob keys the jit cache and a d_k != d_v
    config errors loudly instead of slicing wrong columns)."""
    if bt is None:
        import os
        bt = int(os.environ.get('TPS_FUSED_BT', '64'))
    L, _, H, _, DK = enc_k.shape
    assert weights['wqkv'].shape[2] == 3 * H * DK, (
        'fused decode requires d_k == d_v (packed q|k|v layout): '
        f"wqkv has {weights['wqkv'].shape[2]} cols, expected {3 * H * DK}")
    return _full_greedy_decode_impl(
        enc_k, enc_v, src_mask, weights, S=S, start_idx=start_idx,
        num_classes=num_classes, bt=bt, interpret=interpret, ablate=ablate,
        enc_dtype=enc_dtype, end_idx=end_idx)


@functools.partial(jax.jit, static_argnames=('S', 'start_idx', 'num_classes',
                                             'bt', 'interpret', 'ablate',
                                             'enc_dtype', 'end_idx'))
def _full_greedy_decode_impl(enc_k, enc_v, src_mask, weights, *, S: int,
                             start_idx: int, num_classes: int, bt: int = 64,
                             interpret: bool = False, ablate: str = '',
                             enc_dtype: str = 'int8', end_idx: int = None):
    """Run the whole greedy decode in one pallas kernel.

    enc_k/enc_v: (L, N, H, TE, DK) precomputed encoder K/V (bf16).
    src_mask: (N, TE) 1=valid.
    enc_dtype: 'int8' quantizes the encoder K/V per-(layer, head) — halves
    the dominant VMEM tenant but flips greedy argmax on quantization
    near-ties; 'bfloat16' keeps it in HBM (manual per-block DMA, not
    double-buffered) and is argmax-identical to the XLA `steps` decode.
    weights: dict with stacked per-layer arrays:
      ln1_s/ln1_b/ln2_s/ln2_b/ln3_s/ln3_b (L, 1, D) f32;
      wqkv (L, D, 3*H*DK), wfc1 (L, H*DK, D), wq2 (L, D, H*DK),
      wfc2 (L, H*DK, D), w1 (L, D, DI), w2 (L, DI, D) bf16;
      b1 (L, 1, DI), b2 (L, 1, D) f32;
      lnf_s/lnf_b (1, D) f32; wcls (D, CP) bf16, bcls (1, CP) f32
      (CP = classes padded to a lane multiple); embed (CP, D) bf16;
      pe (S, D) f32.
    Returns (N, S, num_classes) f32 per-step softmax probabilities.
    """
    L, N, H, TE, DK = enc_k.shape
    n_orig = N
    if N % 8:
        # pad the batch to the 8-sublane tile: odd/tiny batches would
        # otherwise drive the batch block below sublane granularity
        # (bt=1 for prime N). Padded rows carry an all-invalid src_mask
        # and are sliced off the result.
        pad_n = (-N) % 8
        enc_k = jnp.concatenate(
            [enc_k, jnp.zeros((L, pad_n, H, TE, DK), enc_k.dtype)], axis=1)
        enc_v = jnp.concatenate(
            [enc_v, jnp.zeros((L, pad_n, H, TE, DK), enc_v.dtype)], axis=1)
        src_mask = jnp.concatenate(
            [src_mask, jnp.zeros((pad_n, TE), src_mask.dtype)], axis=0)
        N += pad_n
    HD = H * DK
    # every head in the lane axis: (L, N, TE, HD) per half, K|V packed in
    # one 2HD-lane tensor (see _attend_allheads)
    enc_kv = jnp.concatenate([
        jnp.transpose(enc_k, (0, 1, 3, 2, 4)).reshape(L, N, TE, HD),
        jnp.transpose(enc_v, (0, 1, 3, 2, 4)).reshape(L, N, TE, HD)],
        axis=-1)                                           # (L,N,TE,2HD)
    # own-head lane masks for the block-diagonal attention; the int8
    # per-(layer, head) dequant scales fold into them (bf16 path: scale 1)
    hm = (np.arange(HD)[None, :] // DK ==
          np.arange(H)[:, None]).astype(np.float32)        # (H, HD)
    enc_quant = enc_dtype == 'int8'
    if enc_quant:
        # int8-quantize the encoder K/V with per-(layer, head) absmax
        # scales — halves the dominant VMEM tenant so batch blocks of 64 fit
        # (full 128-row MXU sublane utilization needs bt >= 64)
        k_scale = jnp.max(jnp.abs(enc_k.astype(jnp.float32)),
                          axis=(1, 3, 4)) / 127.0 + 1e-8   # (L, H)
        v_scale = jnp.max(jnp.abs(enc_v.astype(jnp.float32)),
                          axis=(1, 3, 4)) / 127.0 + 1e-8
        denom = jnp.concatenate([
            jnp.repeat(k_scale, DK, axis=-1),
            jnp.repeat(v_scale, DK, axis=-1)], axis=-1)    # (L, 2HD)
        enc_arg = jnp.clip(jnp.round(
            enc_kv.astype(jnp.float32) / denom[:, None, None, :]),
            -127, 127).astype(jnp.int8)
        maskk = hm[None] * k_scale[:, :, None]             # (L, H, HD)
        maskv = hm[None] * v_scale[:, :, None]
    else:
        # bf16 enc-KV, batch-major so each block's slice is one contiguous
        # leading-dim range for the in-kernel DMA
        enc_arg = jnp.transpose(enc_kv, (1, 0, 2, 3)).astype(jnp.bfloat16)
        maskk = maskv = jnp.broadcast_to(hm[None], (L, H, HD))
    D = weights['embed'].shape[1]
    CP = weights['wcls'].shape[1]
    DI = weights['w1'].shape[2]
    # cache length and probs length padded to the 8-sublane tile so the
    # kernel's per-chunk dynamic-slice stores stay tile-aligned; the cache
    # needs exactly S slots (steps write t <= S-1, attention reads
    # pos <= t), so S=40 costs LESS VMEM than the old S+1=41 layout
    T = ((S + 7) // 8) * 8
    SP = T
    # N is a multiple of 8 here; keep the block a multiple of 8 too so
    # the per-block shapes stay sublane-aligned (prefer the largest such
    # divisor <= bt)
    bt = max(8, min(bt, N) // 8 * 8)
    while N % bt:                      # terminates: 8 divides N
        bt -= 8
    kernel = functools.partial(
        _full_decode_kernel, L=L, H=H, T=T, TE=TE, DK=DK, S=S, SP=SP, CP=CP,
        start_idx=start_idx, num_classes=num_classes, enc_quant=enc_quant,
        ablate=ablate, end_idx=end_idx)

    # Fold each LayerNorm's affine (scale s, bias b) into the matmul that
    # consumes it: y@W for y = norm*s + b equals norm@(s*W) + b@W. The
    # attention 1/sqrt(dk) scale is folded into the q columns too. All
    # folds are computed in f32 once per call, outside the decode loop.
    f32 = jnp.float32
    HDm = H * DK
    qsc = 1.0 / (DK ** 0.5)
    colscale = jnp.concatenate([
        jnp.full((HDm,), qsc, f32), jnp.ones((2 * HDm,), f32)])
    wqkv0 = weights['wqkv'].astype(f32)
    wqkv = wqkv0 * jnp.swapaxes(weights['ln1_s'].astype(f32), 1, 2) * colscale
    bqkv = jnp.matmul(weights['ln1_b'].astype(f32), wqkv0) * colscale
    wq20 = weights['wq2'].astype(f32)
    wq2 = wq20 * jnp.swapaxes(weights['ln2_s'].astype(f32), 1, 2) * qsc
    bq2 = jnp.matmul(weights['ln2_b'].astype(f32), wq20) * qsc
    w10 = weights['w1'].astype(f32)
    w1 = w10 * jnp.swapaxes(weights['ln3_s'].astype(f32), 1, 2)
    b1 = jnp.matmul(weights['ln3_b'].astype(f32), w10) + \
        weights['b1'].astype(f32)
    wcls0 = weights['wcls'].astype(f32)
    wcls = wcls0 * weights['lnf_s'].astype(f32)[0][:, None]
    bcls = weights['bcls'].astype(f32) + \
        jnp.matmul(weights['lnf_b'].astype(f32), wcls0)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    if enc_quant:
        enc_spec = pl.BlockSpec((L, bt, TE, 2 * HDm),
                                lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((L, bt, T, 2 * HDm), jnp.bfloat16)]
    else:
        enc_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((L, bt, T, 2 * HDm), jnp.bfloat16),
                   pltpu.VMEM((bt, L, TE, 2 * HDm), jnp.bfloat16),
                   pltpu.SemaphoreType.DMA(())]
    grid = (N // bt,)
    probs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, TE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),               # mask
            fixed((CP, D)),                                      # embed
            fixed((S, D)),                                       # pe
            fixed((L, D, 3 * H * DK)), fixed((L, 1, 3 * H * DK)),  # qkv
            fixed((L, H * DK, D)),                               # fc1
            fixed((L, D, H * DK)), fixed((L, 1, H * DK)),        # q2
            fixed((L, H * DK, D)),                               # fc2
            fixed((L, D, DI)), fixed((L, 1, DI)),                # w1/b1
            fixed((L, DI, D)), fixed((L, 1, D)),                 # w2/b2
            fixed((D, CP)), fixed((1, CP)),                      # cls
            fixed((L, H, HDm)), fixed((L, H, HDm)),              # head masks
            enc_spec,                                            # enc_kv
        ],
        out_specs=pl.BlockSpec((bt, SP, CP), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, SP, CP), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(src_mask.astype(jnp.float32), weights['embed'].astype(jnp.bfloat16),
      weights['pe'].astype(jnp.float32),
      wqkv.astype(jnp.bfloat16), bqkv,
      weights['wfc1'].astype(jnp.bfloat16),
      wq2.astype(jnp.bfloat16), bq2,
      weights['wfc2'].astype(jnp.bfloat16),
      w1.astype(jnp.bfloat16), b1,
      weights['w2'].astype(jnp.bfloat16), weights['b2'].astype(jnp.float32),
      wcls.astype(jnp.bfloat16), bcls,
      maskk.astype(jnp.float32), maskv.astype(jnp.float32), enc_arg)
    return probs[:n_orig, :S, :num_classes]

