"""Whole-encoder Pallas kernel: all 6 TFEncoderLayers in ONE launch.

The XLA encoder path costs ~21 ms at B=512 (T=64, D=512) against a ~2-4 ms
FLOP bound: like the decode loop it is dominated by per-op fixed cost and
f32 intermediate HBM traffic (each elementwise op on the (32768, 512)
activation moves ~134 MB). This kernel keeps all 6 layers' weights (~31 MB
bf16) and the activation block VMEM-resident and runs
LN -> qkv -> per-head attention -> proj -> LN -> FFN for every layer in one
pass per batch block.

Attention without in-kernel reshapes (Mosaic forbids them): the block
processes ``bi`` images = bi*T rows as ONE 2D (bi*T, D) activation; scores
are computed over the full (bi*T, bi*T) tile and masked BLOCK-DIAGONAL
(row i attends key j iff i//T == j//T and j is valid), which is exactly
per-image attention — the off-diagonal FLOPs are free MXU padding at these
sizes (~0.4 ms total vs the ~16 ms saved).

Numerics: bf16 matmuls with f32 accumulation, f32 LN/softmax, polynomial
erf GELU — the same recipe as ops/pallas_full_decode.py; equivalence vs
the XLA encoder is asserted in tests/test_pallas_encoder.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import _erf, _layernorm
from .pallas_full_decode import _ln_norm

NEG_INF = -1e9


def _encoder_kernel(mask_ref, x_ref,
                    wqkv_ref, bqkv_ref, wfc_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref,
                    lnfs_ref, lnfb_ref, out_ref, *,
                    L, H, T, DK):
    cdt = wqkv_ref.dtype                     # matmul compute dtype
    R = x_ref.shape[0]                       # bi * T rows
    x = x_ref[:].astype(jnp.float32)
    # block-diagonal same-image mask + key-validity mask, shared by layers
    row_img = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // T
    col_img = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // T
    valid = mask_ref[:] > 0                                    # (1, R)
    attend = (row_img == col_img) & valid
    HD = H * DK
    for l in range(L):
        # per-layer LN affines + the attention 1/sqrt(dk) are folded into
        # the adjacent matmul weights/biases host-side (fused_encoder_
        # forward) — same trick as the decode kernel's _ln_norm
        y = _ln_norm(x)
        qkv = jnp.dot(y.astype(cdt), wqkv_ref[l],
                      preferred_element_type=jnp.float32) + bqkv_ref[l]
        heads = []
        for h in range(H):
            q_h = qkv[:, h * DK:(h + 1) * DK].astype(cdt)
            k_h = qkv[:, HD + h * DK:HD + (h + 1) * DK].astype(cdt)
            v_h = qkv[:, 2 * HD + h * DK:2 * HD + (h + 1) * DK].astype(
                cdt)
            scores = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (R, R)
            scores = jnp.where(attend, scores, NEG_INF)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
            heads.append(jnp.dot(w, v_h,
                                 preferred_element_type=jnp.float32))
        sa = jnp.concatenate(heads, axis=-1)                   # (R, HD)
        x = x + jnp.dot(sa.astype(cdt), wfc_ref[l],
                        preferred_element_type=jnp.float32)
        y2 = _ln_norm(x)
        h1 = jnp.dot(y2.astype(cdt), w1_ref[l],
                     preferred_element_type=jnp.float32) + b1_ref[l]
        h1 = 0.5 * h1 * (1.0 + _erf(h1 * 0.7071067811865476))
        h2 = jnp.dot(h1.astype(cdt), w2_ref[l],
                     preferred_element_type=jnp.float32) + b2_ref[l]
        x = x + h2
    x = _layernorm(x, lnfs_ref[:], lnfb_ref[:])
    out_ref[...] = x.astype(out_ref.dtype)


def fused_encoder_forward(x, mask, weights, *, T: int, H: int = 8,
                          bi: int = None, interpret: bool = False,
                          compute_dtype: str = 'bfloat16'):
    """Run the whole NRTR encoder in one pallas kernel (see the jitted
    core below). ``bi`` (images per block) defaults to the ``TPS_ENC_BI``
    env knob or 2 — resolved HERE, outside the jitted core, so the knob
    participates in the jit cache key. Measured at B=512 flagship:
    bi=16 44.3 ms, 8 42.9, 4 42.7, 2 41.6 (feat+encoder prefix; bi=1
    trips an MLIR lowering bug in this jax build — smaller bi shrinks the
    block-diagonal attention overcompute, FLOPs ~ bi per row)."""
    if bi is None:
        import os
        bi = int(os.environ.get('TPS_ENC_BI', 2))
    # the kernel assumes the packed q|k|v layout with d_k == d_v: a
    # mismatched decoder config would otherwise slice wrong columns
    # silently (wqkv BlockSpec truncates)
    HD = weights['wfc'].shape[1]
    assert weights['wqkv'].shape[2] == 3 * HD, (
        'fused encoder requires d_k == d_v (packed q|k|v layout): '
        f"wqkv has {weights['wqkv'].shape[2]} cols, expected {3 * HD}")
    return _fused_encoder_forward_impl(
        x, mask, weights, T=T, H=H, bi=bi, interpret=interpret,
        compute_dtype=compute_dtype)


@functools.partial(jax.jit, static_argnames=('T', 'H', 'bi', 'interpret',
                                             'compute_dtype'))
def _fused_encoder_forward_impl(x, mask, weights, *, T: int, H: int = 8,
                                bi: int = 2, interpret: bool = False,
                                compute_dtype: str = 'bfloat16'):
    """Jitted core of the whole-encoder kernel.

    x: (N, T, D) tokens (bf16/f32); mask: (N, T) 1=valid (or None);
    weights dict with stacked per-layer arrays:
      ln1_s/ln1_b/ln2_s/ln2_b (L, 1, D) f32; wqkv (L, D, 3*H*DK) bf16
      (q|k|v concat), wfc (L, H*DK, D) bf16; w1 (L, D, DI) bf16,
      b1 (L, 1, DI) f32; w2 (L, DI, D) bf16, b2 (L, 1, D) f32;
      lnf_s/lnf_b (1, D) f32.
    Returns (N, T, D) in x.dtype.
    """
    N, T_, D = x.shape
    assert T_ == T
    cdt = jnp.dtype(compute_dtype)
    L = weights['wqkv'].shape[0]
    HD = weights['wfc'].shape[1]
    assert HD % H == 0
    DK = HD // H
    DI = weights['w1'].shape[2]
    while N % bi and bi > 1:
        bi -= 1
    n_orig = N
    if bi == 1:
        # bi=1 trips an MLIR lowering bug in this jax build — pad the
        # batch to even with masked dummy images instead (block-diagonal
        # attention keeps them from touching real rows) and slice after
        bi = 2
        pad_n = (-N) % bi
        x = jnp.concatenate(
            [x, jnp.zeros((pad_n, T, D), x.dtype)], axis=0)
        if mask is not None:
            mask = jnp.concatenate(
                [mask, jnp.zeros((pad_n, T), mask.dtype)], axis=0)
        N += pad_n
    R = bi * T
    x2 = x.reshape(N * T, D)
    if mask is None:
        mask2 = jnp.ones((1, N * T), jnp.float32)
    else:
        mask2 = mask.reshape(1, N * T).astype(jnp.float32)
    kernel = functools.partial(_encoder_kernel, L=L, H=H, T=T, DK=DK)

    # fold each LayerNorm affine (scale s, bias b) into the matmul that
    # consumes it — y@W for y = norm*s + b equals norm@(s*W) + b@W — and
    # the attention 1/sqrt(dk) into the q columns (same as the decode
    # kernel); all folds in f32 once per call
    f32 = jnp.float32
    qsc = 1.0 / (DK ** 0.5)
    colscale = jnp.concatenate([
        jnp.full((HD,), qsc, f32), jnp.ones((2 * HD,), f32)])
    wqkv0 = weights['wqkv'].astype(f32)
    wqkv = wqkv0 * jnp.swapaxes(weights['ln1_s'].astype(f32), 1, 2) * colscale
    bqkv = jnp.matmul(weights['ln1_b'].astype(f32), wqkv0) * colscale
    w10 = weights['w1'].astype(f32)
    w1 = w10 * jnp.swapaxes(weights['ln2_s'].astype(f32), 1, 2)
    b1 = jnp.matmul(weights['ln2_b'].astype(f32), w10) + \
        weights['b1'].astype(f32)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(N * T // R,),
        in_specs=[
            pl.BlockSpec((1, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),             # mask
            pl.BlockSpec((R, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # x
            fixed((L, D, 3 * HD)), fixed((L, 1, 3 * HD)),      # qkv
            fixed((L, HD, D)),                                 # fc
            fixed((L, D, DI)), fixed((L, 1, DI)),              # w1 / b1
            fixed((L, DI, D)), fixed((L, 1, D)),               # w2 / b2
            fixed((1, D)), fixed((1, D)),                      # lnf
        ],
        out_specs=pl.BlockSpec((R, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N * T, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(mask2, x2,
      wqkv.astype(cdt), bqkv,
      weights['wfc'].astype(cdt),
      w1.astype(cdt), b1,
      weights['w2'].astype(cdt),
      weights['b2'].astype(jnp.float32),
      weights['lnf_s'].astype(jnp.float32),
      weights['lnf_b'].astype(jnp.float32))
    return out.reshape(N, T, D)[:n_orig]
