"""Fused TPS++ rectification kernel (Pallas, TPU).

The BASELINE north-star fusion: the reference runs three separate ops —
score-modulated grid generation (two bmms, tps_pp.py:481-496) and two
``F.grid_sample`` warps (tps_pp.py:606-615). This kernel fuses all of it
into one VMEM-resident pass per (batch, pixel-tile) grid cell:

  1. T  = inv_delta_C @ [C'; 0]                (35x35 @ 35x2, MXU)
  2. P' = [1 | P | P_hat*(score*theta+1)] @ T  (TILE x 35 @ 35x2, MXU)
  3. bilinear sampling of BOTH feature maps at P' — expressed as
     interpolation-matrix contractions (hat-function row/col weights),
     i.e. more MXU matmuls instead of gathers, which TPUs hate.

Grid values keep the reference's quirk: [0,1]-coordinates interpreted by a
[-1,1] sampler with align_corners=True + border clamp (SURVEY §2.3).

Numerical contract: matches the XLA path (ops/tps.build_P_prime +
ops/grid_sample.grid_sample) to fp32 tolerance — asserted in
tests/test_pallas_tps.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

THETA = 0.5  # score-modulation strength (reference thela, tps_pp.py:342)


def _kernel(cp_ref, score_ref, fg_ref, img_ref, inv_ref, phat_ref, p_ref,
            rect_ref, mp_ref, *, Hg, Wg, Hi, Wi, C, TILE):
    # refs (leading batch-block dim of 1 dropped by indexing [0]);
    # feature maps arrive pre-flattened as (1, H*W, C) — Mosaic disallows
    # in-kernel shape casts, so all math stays 2D.
    cp = cp_ref[0]                      # (F, 2)
    score = score_ref[0]                # (TILE, F)
    phat = phat_ref[0]                  # (TILE, F)
    p = p_ref[0]                        # (TILE, 2)
    inv = inv_ref[:]                    # (F+3, F+3)

    # 1) T = inv_delta_C @ [C'; 0]
    cp_full = jnp.concatenate([cp, jnp.zeros((3, 2), jnp.float32)], axis=0)
    T = jnp.dot(inv, cp_full, preferred_element_type=jnp.float32)  # (F+3, 2)

    # 2) P' for this pixel tile
    phat_mod = phat * (score * THETA + 1.0)
    ones = jnp.ones((TILE, 1), jnp.float32)
    phat_full = jnp.concatenate([ones, p, phat_mod], axis=1)  # (TILE, F+3)
    pprime = jnp.dot(phat_full, T,
                     preferred_element_type=jnp.float32)      # (TILE, 2)

    # 3) bilinear sample both maps. The combined bilinear weight matrix
    #    W2[p, h*W+w] = hat(gy_p - h) * hat(gx_p - w) is built directly
    #    from an integer iota (elementwise, no reshape/gather), then one
    #    (TILE, H*W) @ (H*W, C) matmul does the warp on the MXU.
    def sample(src_ref, H, W, out_ref):
        gx = (pprime[:, 0] + 1.0) * 0.5 * (W - 1)   # align_corners=True
        gy = (pprime[:, 1] + 1.0) * 0.5 * (H - 1)
        gx = jnp.clip(gx, 0.0, W - 1.0)              # border padding
        gy = jnp.clip(gy, 0.0, H - 1.0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (TILE, H * W), 1)
        h_idx = (kk // W).astype(jnp.float32)
        w_idx = (kk % W).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(gy[:, None] - h_idx))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(gx[:, None] - w_idx))
        # the dense interpolation matrix is the kernel's VMEM hot spot —
        # match its precision to the feature dtype: bf16 features (the
        # serving path) take bf16 weights into the MXU with f32
        # accumulation (weights live in [0,1], 4 effective terms per
        # output — drift ~1e-2 absolute, under the bf16 feature noise
        # already present); f32 features keep the exact f32 path.
        w2 = (wy * wx).astype(src_ref.dtype)          # (TILE, H*W)
        out = jnp.dot(w2, src_ref[0],
                      preferred_element_type=jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

    sample(fg_ref, Hg, Wg, rect_ref)
    if mp_ref is not None:
        sample(img_ref, Hi, Wi, mp_ref)


def _kernel_twostage(cp_ref, score_ref, fg_ref, img_ref, inv_ref, phat_ref,
                     p_ref, rect_ref, mp_ref, *, Hg, Wg, Hi, Wi, C, TILE):
    """Two-stage bilinear warp: contract W first, then reduce H.

    The dense kernel builds the (TILE, H*W) interpolation matrix on the
    VPU (its hot spot: ~9 elementwise ops x TILE x H*W) and feeds a
    half-lane-utilized (TILE, H*W) @ (H*W, C) matmul. Here the feature
    map arrives pre-transposed as (W, H*C), so stage 1 is a single
    full-utilization MXU contraction with only a (TILE, W) hat matrix to
    build, and stage 2 reduces the H axis with lane-aligned paired-h
    multiplies plus a constant fold matmul. Same math, same edge
    semantics (align_corners + border clamp), ~10x less VPU work.
    """
    cp = cp_ref[0]                      # (F, 2)
    score = score_ref[0]                # (TILE, F)
    phat = phat_ref[0]                  # (TILE, F)
    p = p_ref[0]                        # (TILE, 2)
    inv = inv_ref[:]                    # (F+3, F+3)

    cp_full = jnp.concatenate([cp, jnp.zeros((3, 2), jnp.float32)], axis=0)
    T = jnp.dot(inv, cp_full, preferred_element_type=jnp.float32)
    phat_mod = phat * (score * THETA + 1.0)
    ones = jnp.ones((TILE, 1), jnp.float32)
    phat_full = jnp.concatenate([ones, p, phat_mod], axis=1)
    pprime = jnp.dot(phat_full, T,
                     preferred_element_type=jnp.float32)      # (TILE, 2)

    def sample(srcp_ref, H, W, out_ref):
        # srcp holds the map as (W, H*C): srcp[w, h*C+c] = src[h, w, c]
        gx = (pprime[:, 0] + 1.0) * 0.5 * (W - 1)   # align_corners=True
        gy = (pprime[:, 1] + 1.0) * 0.5 * (H - 1)
        gx = jnp.clip(gx, 0.0, W - 1.0)              # border padding
        gy = jnp.clip(gy, 0.0, H - 1.0)
        w_idx = jax.lax.broadcasted_iota(
            jnp.int32, (TILE, W), 1).astype(jnp.float32)
        h_idx = jax.lax.broadcasted_iota(
            jnp.int32, (TILE, H), 1).astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(gx[:, None] - w_idx))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(gy[:, None] - h_idx))
        # stage 1: one (TILE, W) @ (W, H*C) contraction (f32 accumulate)
        tmp = jnp.dot(wx.astype(srcp_ref.dtype), srcp_ref[0],
                      preferred_element_type=jnp.float32)     # (TILE, H*C)
        # stage 2: out[p, c] = sum_h wy[p, h] * tmp[p, h*C + c].
        # Two constant iota-built matrices turn this into MXU work:
        #   wyexp = wy @ E,   E[h, h*C + c] = 1      (lane-expand wy)
        #   out   = (wyexp * tmp) @ fold, fold[h*C + c, c] = 1   ([I;I;..])
        # One VPU multiply over (TILE, H*C) in between — an earlier
        # paired-h unrolled loop here blew the 16M scoped-VMEM stack at
        # compile (21.6M); this form stays ~7M and has no even-H
        # restriction.
        je = jax.lax.broadcasted_iota(jnp.int32, (H, H * C), 1)
        he = jax.lax.broadcasted_iota(jnp.int32, (H, H * C), 0)
        E = (je // C == he).astype(jnp.float32)               # (H, H*C)
        wyexp = jnp.dot(wy, E, preferred_element_type=jnp.float32)
        rr = jax.lax.broadcasted_iota(jnp.int32, (H * C, C), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (H * C, C), 1)
        fold = (rr % C == cc).astype(jnp.float32)             # [I; I; ..]
        out = jnp.dot(wyexp * tmp, fold,
                      preferred_element_type=jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

    sample(fg_ref, Hg, Wg, rect_ref)
    if mp_ref is not None:
        sample(img_ref, Hi, Wi, mp_ref)


def tps_grid_sample_fused(feat_grid, batch_img, control_point, pc_score,
                          inv_delta_C, P_hat, P, out_hw, tile: int = 256,
                          interpret: bool = False, with_mp: bool = True,
                          variant: str | None = None):
    """Fused rectification — see :func:`_tps_grid_sample_fused_impl`.

    ``variant`` picks the kernel ('dense' | 'twostage'); None reads the
    ``TPS_SAMPLER_VARIANT`` env knob. Resolved OUTSIDE the jitted core so
    DIRECT calls key the jit cache on it. NOTE: when this runs inlined in
    a larger jit (the recognizer's predict), the env knob is baked in at
    the OUTER trace — set it before the first model call; in-process
    flips after a compile are silently ignored (A/B measurements must use
    a fresh process per variant).
    """
    import os
    if variant is None:
        variant = os.environ.get('TPS_SAMPLER_VARIANT', 'dense')
    # the tile knob is resolved here too, for the same cache-key reason
    tile = int(os.environ.get('TPS_SAMPLER_TILE', tile))
    return _tps_grid_sample_fused_impl(
        feat_grid, batch_img, control_point, pc_score, inv_delta_C, P_hat,
        P, out_hw, tile=tile, interpret=interpret, with_mp=with_mp,
        variant=variant)


@functools.partial(jax.jit, static_argnames=('out_hw', 'tile', 'interpret',
                                             'with_mp', 'variant'))
def _tps_grid_sample_fused_impl(feat_grid: jax.Array, batch_img: jax.Array,
                                control_point: jax.Array, pc_score: jax.Array,
                                inv_delta_C: jax.Array, P_hat: jax.Array,
                                P: jax.Array, out_hw: Tuple[int, int],
                                tile: int = 256, interpret: bool = False,
                                with_mp: bool = True,
                                variant: str = 'dense'):
    """Fused rectification.

    Args:
      feat_grid: (N, Hg, Wg, C) full-res reference feature.
      batch_img: (N, Hi, Wi, C) stage-2 feature.
      control_point: (N, F, 2); pc_score: (N, n, F) with n = Hr*Wr.
      inv_delta_C: (F+3, F+3); P_hat: (n, F); P: (n, 2) — static TPS mats.
      out_hw: (Hr, Wr).
      with_mp: also warp ``batch_img`` (the reference's second
        ``F.grid_sample``, tps_pp.py:611-615). NOTHING consumes that
        output — the reference returns it as 'mp_img' and no caller reads
        it — so the serving path skips the warp (~25% of the kernel's
        interp-matrix construction + matmul work).
    Returns: (rect (N,Hr,Wr,C), mp (N,Hr,Wr,C) or None).
    """
    N, Hg, Wg, C = feat_grid.shape
    _, Hi, Wi, _ = batch_img.shape
    Hr, Wr = out_hw
    n = Hr * Wr
    Fd = control_point.shape[1]
    tile = min(tile, n)
    assert n % tile == 0, (n, tile)

    f32 = jnp.float32
    # 'twostage' replaces the dense interpolation-matrix build with a
    # W-contraction over a (W, H*C)-transposed feature layout + an H
    # reduction (see _kernel_twostage) — less VPU work, full MXU lanes.
    if variant == 'twostage':
        kernel = functools.partial(_kernel_twostage, Hg=Hg, Wg=Wg, Hi=Hi,
                                   Wi=Wi, C=C, TILE=tile)
        def _prep(a, H, W):            # (N,H,W,C) -> (N, W, H*C)
            return a.transpose(0, 2, 1, 3).reshape(N, W, H * C)
        fg_arg = _prep(feat_grid, Hg, Wg)
        img_arg = _prep(batch_img, Hi, Wi) if with_mp else None
        fg_spec = pl.BlockSpec((1, Wg, Hg * C), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        img_spec = pl.BlockSpec((1, Wi, Hi * C), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_kernel, Hg=Hg, Wg=Wg, Hi=Hi, Wi=Wi, C=C,
                                   TILE=tile)
        fg_arg = feat_grid.reshape(N, Hg * Wg, C)
        img_arg = batch_img.reshape(N, Hi * Wi, C) if with_mp else None
        fg_spec = pl.BlockSpec((1, Hg * Wg, C), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        img_spec = pl.BlockSpec((1, Hi * Wi, C), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    if not with_mp:
        # the stage-2 feature is never read: feed a (N, 1, C) dummy so the
        # pipeline neither DMAs nor double-buffers the full dead block
        # (frees its VMEM for the tile-size headroom)
        img_arg = jnp.zeros((N, 1, C), batch_img.dtype)
        img_spec = pl.BlockSpec((1, 1, C), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        kernel = functools.partial(
            lambda _k, *refs: _k(*refs, None), kernel)
    grid = (N, n // tile)
    # twostage's (TILE, H*C) f32 stage-1/2 intermediates brush the default
    # 16M scoped-VMEM stack at TILE=256 (16.25M measured); raise the limit —
    # total VMEM is 128M and this kernel holds no other large buffers
    params = (pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)
              if variant == 'twostage' and not interpret else None)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((1, Fd, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, Fd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            fg_spec,
            img_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),       # inv_delta_C
            pl.BlockSpec((1, tile, Fd), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),        # P_hat (bcast N)
            pl.BlockSpec((1, tile, 2), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),        # P
        ],
        out_specs=[
            pl.BlockSpec((1, tile, C), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((1, tile, C), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)] if with_mp else []),
        out_shape=[
            jax.ShapeDtypeStruct((N, n, C), feat_grid.dtype),
        ] + ([jax.ShapeDtypeStruct((N, n, C), batch_img.dtype)]
             if with_mp else []),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # grid-gen matmuls + the warp contraction(s): each warp costs
            # 2*n*(H*W)*C FLOPs per image in both variants (the dense
            # interp matmul and the twostage W-contraction do the same
            # arithmetic); mp's share only exists when with_mp
            flops=2 * N * n * (Fd + 3) * 2 +
            2 * N * n * (Hg * Wg + (Hi * Wi if with_mp else 0)) * C,
            bytes_accessed=N * (Hg * Wg +
                                (Hi * Wi if with_mp else 0)) * C * 4 +
            (2 if with_mp else 1) * N * n * C * 4,
            transcendentals=0),
    )(control_point.astype(f32), pc_score.astype(f32),
      fg_arg, img_arg,
      inv_delta_C.astype(f32), P_hat.astype(f32)[None], P.astype(f32)[None])
    rect = outs[0].reshape(N, Hr, Wr, C)
    mp = outs[1].reshape(N, Hr, Wr, C) if with_mp else None
    return rect, mp
