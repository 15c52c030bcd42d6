"""Fused transformer decode-step kernels (Pallas, TPU).

Measured on this runtime, each XLA op inside the decode loop costs ~12-15us
of launch overhead, and a 6-layer NRTR decode step is ~150 ops — the decode
loop is op-count-bound, not FLOP-bound. These kernels collapse each layer's
step into two pallas ops:

  * ``self_attn_step``  — LN1 + fused QKV + KV-cache append (in-place via
    input_output_aliases) + masked attention over the cache prefix + output
    projection + residual. ~11 XLA ops -> 1.
  * ``cross_ffn_step``  — LN2 + cross-attention over precomputed encoder
    K/V (masked) + projection + residual + LN3 + GELU FFN + residual.
    ~10 XLA ops -> 1.

Per-head attention is expressed as elementwise multiply+reduce (VPU) —
tiny T<=41/64 key counts don't need the MXU — and all matmuls stay 2D
(Mosaic rejects in-kernel reshapes). Numerics: f32 accumulation, bf16 in/out.
Parity with the unfused path is asserted in tests/test_pallas_decode.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _fit_tile(n: int, bt: int) -> int:
    """Largest divisor of n that is <= bt."""
    bt = min(bt, n)
    while n % bt:
        bt -= 1
    return bt


def _erf(x):
    """Abramowitz-Stegun 7.1.26 polynomial erf (max err 1.5e-7 — below bf16
    resolution); Mosaic lowers neither erf nor erfc."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _layernorm(x, scale, bias, eps=1e-5):
    # torch nn.LayerNorm default — the reference's per-layer norms
    # (transformer_layers.py:43-46,110-112) never override eps; mirrors the
    # flax modules in models/transformer.py (epsilon=1e-5)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias)


def _self_attn_kernel(t_ref, x_ref, wqkv_ref, wfc_ref, ln_s_ref, ln_b_ref,
                      ck_ref, cv_ref, xo_ref, cko_ref, cvo_ref, *,
                      H, T, DK, scale):
    t = t_ref[0]
    x = x_ref[:]                                   # (BT, D)
    y = _layernorm(x, ln_s_ref[:], ln_b_ref[:])    # f32
    qkv = jnp.dot(y.astype(jnp.bfloat16), wqkv_ref[:],
                  preferred_element_type=jnp.float32)   # (BT, 3*H*DK)
    HD = H * DK
    BT = x.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (BT, T), 1)
    key_mask = (pos <= t)                          # (BT, T)
    out_cols = []
    for h in range(H):
        q_h = qkv[:, h * DK:(h + 1) * DK] * scale           # (BT, DK)
        k_h = qkv[:, HD + h * DK:HD + (h + 1) * DK]
        v_h = qkv[:, 2 * HD + h * DK:2 * HD + (h + 1) * DK]
        # append to cache via a one-hot masked full-block write (Mosaic
        # rejects dynamic-slice stores into 4D refs; the block is staged
        # through VMEM in full either way, so this costs nothing extra)
        bt = k_h.shape[0]
        slot = (jax.lax.broadcasted_iota(jnp.int32, (bt, T, DK), 1) == t)
        k3 = jax.lax.broadcast_in_dim(k_h, (bt, T, DK), (0, 2))
        v3 = jax.lax.broadcast_in_dim(v_h, (bt, T, DK), (0, 2))
        ck_h = jnp.where(slot, k3, ck_ref[:, h, :, :].astype(jnp.float32))
        cv_h = jnp.where(slot, v3, cv_ref[:, h, :, :].astype(jnp.float32))
        cko_ref[:, h, :, :] = ck_h.astype(cko_ref.dtype)
        cvo_ref[:, h, :, :] = cv_h.astype(cvo_ref.dtype)
        q3 = jax.lax.broadcast_in_dim(q_h, (bt, T, DK), (0, 2))
        scores = jnp.sum(q3 * ck_h, axis=-1)                # (BT, T)
        scores = jnp.where(key_mask, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        w3 = jax.lax.broadcast_in_dim(w, (bt, T, DK), (0, 1))
        out_h = jnp.sum(w3 * cv_h, axis=1)                  # (BT, DK)
        out_cols.append(out_h)
    merged = jnp.concatenate(out_cols, axis=-1)             # (BT, D)
    proj = jnp.dot(merged.astype(jnp.bfloat16), wfc_ref[:],
                   preferred_element_type=jnp.float32)
    xo_ref[:] = (x.astype(jnp.float32) + proj).astype(xo_ref.dtype)


@functools.partial(jax.jit, static_argnames=('bt', 'interpret'))
def self_attn_step(x, ck, cv, t, wqkv, wfc, ln_scale, ln_bias,
                   bt: int = 64, interpret: bool = False):
    """One fused self-attention decode step.

    x (N, D) bf16; ck/cv (N, H, T, DK) caches (updated in place);
    t scalar int32. Returns (x_out, ck, cv).
    """
    N, D = x.shape
    _, H, T, DK = ck.shape
    bt = _fit_tile(N, bt)
    scale = 1.0 / (DK ** 0.5)
    kernel = functools.partial(_self_attn_kernel, H=H, T=T, DK=DK,
                               scale=scale)
    t_arr = jnp.asarray(t, jnp.int32).reshape(1)
    grid = (N // bt,)
    xo, cko, cvo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # t
            pl.BlockSpec((bt, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                     # x
            pl.BlockSpec((D, 3 * H * DK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                     # wqkv
            pl.BlockSpec((H * DK, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                     # wfc
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                     # ln s
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                     # ln b
            pl.BlockSpec((bt, H, T, DK), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),                     # ck
            pl.BlockSpec((bt, H, T, DK), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),                     # cv
        ],
        out_specs=[
            pl.BlockSpec((bt, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H, T, DK), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H, T, DK), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), x.dtype),
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
        ],
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(t_arr, x, wqkv.astype(jnp.bfloat16), wfc.astype(jnp.bfloat16),
      ln_scale.astype(jnp.float32).reshape(1, -1),
      ln_bias.astype(jnp.float32).reshape(1, -1), ck, cv)
    return xo, cko, cvo


def _cross_ffn_kernel(x_ref, ek_ref, ev_ref, mask_ref, wq_ref, wfc_ref,
                      ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      ln3s_ref, ln3b_ref, xo_ref, *, H, TE, DK, scale):
    x = x_ref[:]
    y = _layernorm(x, ln2s_ref[:], ln2b_ref[:])
    q = jnp.dot(y.astype(jnp.bfloat16), wq_ref[:],
                preferred_element_type=jnp.float32)          # (BT, D)
    valid = mask_ref[:] > 0                                   # (BT, TE)
    out_cols = []
    for h in range(H):
        q_h = q[:, h * DK:(h + 1) * DK] * scale
        bt = q_h.shape[0]
        ek_h = ek_ref[:, h, :, :].astype(jnp.float32)         # (BT, TE, DK)
        ev_h = ev_ref[:, h, :, :].astype(jnp.float32)
        q3 = jax.lax.broadcast_in_dim(q_h, (bt, TE, DK), (0, 2))
        scores = jnp.sum(q3 * ek_h, axis=-1)                  # (BT, TE)
        scores = jnp.where(valid, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        w3 = jax.lax.broadcast_in_dim(w, (bt, TE, DK), (0, 1))
        out_cols.append(jnp.sum(w3 * ev_h, axis=1))
    merged = jnp.concatenate(out_cols, axis=-1)
    proj = jnp.dot(merged.astype(jnp.bfloat16), wfc_ref[:],
                   preferred_element_type=jnp.float32)
    x2 = x.astype(jnp.float32) + proj
    y3 = _layernorm(x2, ln3s_ref[:], ln3b_ref[:])
    h1 = jnp.dot(y3.astype(jnp.bfloat16), w1_ref[:],
                 preferred_element_type=jnp.float32) + b1_ref[:]
    # exact GELU via polynomial erf
    h1 = 0.5 * h1 * (1.0 + _erf(h1 * 0.7071067811865476))
    h2 = jnp.dot(h1.astype(jnp.bfloat16), w2_ref[:],
                 preferred_element_type=jnp.float32) + b2_ref[:]
    xo_ref[:] = (x2 + h2).astype(xo_ref.dtype)


@functools.partial(jax.jit, static_argnames=('bt', 'interpret'))
def cross_ffn_step(x, enc_k, enc_v, src_mask, wq, wfc, ln2_s, ln2_b,
                   w1, b1, w2, b2, ln3_s, ln3_b, bt: int = 64,
                   interpret: bool = False):
    """Fused cross-attention + FFN decode step. x (N, D); enc_k/v
    (N, H, TE, DK); src_mask (N, TE) 1=valid. Returns x_out (N, D)."""
    N, D = x.shape
    _, H, TE, DK = enc_k.shape
    DI = w1.shape[1]
    bt = _fit_tile(N, bt)
    scale = 1.0 / (DK ** 0.5)
    kernel = functools.partial(_cross_ffn_kernel, H=H, TE=TE, DK=DK,
                               scale=scale)
    if src_mask is None:
        src_mask = jnp.ones((N, TE), jnp.float32)
    grid = (N // bt,)
    bf = jnp.bfloat16
    f32 = jnp.float32
    xo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H, TE, DK), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H, TE, DK), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, TE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H * DK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H * DK, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, DI), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DI), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DI, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, enc_k, enc_v, src_mask.astype(f32), wq.astype(bf), wfc.astype(bf),
      ln2_s.astype(f32).reshape(1, -1), ln2_b.astype(f32).reshape(1, -1),
      w1.astype(bf), b1.astype(f32).reshape(1, -1), w2.astype(bf),
      b2.astype(f32).reshape(1, -1), ln3_s.astype(f32).reshape(1, -1),
      ln3_b.astype(f32).reshape(1, -1))
    return xo
