"""Pallas backward kernel for ``grid_sample``: grad-wrt-image as matmuls.

XLA lowers the gradient of gather+lerp sampling (ops/grid_sample.py) to a
scatter-add into the source image. TPU scatters with duplicate indices
serialize — measured at ~420 ms of the flagship's 640 ms training step at
B=512 (scratch/profile_train.py), 66% of training time for <0.3% of its
FLOPs. The reference never sees this cost: ATen's CUDA ``grid_sample``
backward (reference tps_pp.py:606-615 trains through it) scatters with
hardware atomics.

This kernel is the TPU-native transpose of the fused forward sampler
(ops/pallas_tps.py ``_kernel``): build the dense bilinear interpolation
matrix ``W2[p, h*W+w] = hat(gy_p-h) * hat(gx_p-w)`` from an integer iota
(VPU, no gather), then accumulate

    grad_img[h*W+w, c] += sum_p W2[p, hw] * cot[p, c]

as one MXU contraction per (batch row, pixel tile) — zero scatters. Border
mode clamps coordinates first (matching the forward's clip); zeros mode
skips the clamp, so out-of-range taps fall off the iota range and
contribute nothing, exactly like the forward's in-bounds masking.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _bwd_kernel(grid_ref, cot_ref, out_ref, *, H, W, TILE,
                padding_mode, align_corners):
    pt = pl.program_id(1)
    g = grid_ref[0]                                    # (TILE, 2) f32
    gx = _unnormalize(g[:, 0], W, align_corners)
    gy = _unnormalize(g[:, 1], H, align_corners)
    if padding_mode == 'border':
        gx = jnp.clip(gx, 0.0, W - 1.0)
        gy = jnp.clip(gy, 0.0, H - 1.0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (TILE, H * W), 1)
    h_idx = (kk // W).astype(jnp.float32)
    w_idx = (kk % W).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(gy[:, None] - h_idx))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(gx[:, None] - w_idx))
    # weight precision matches the cotangent dtype (same policy as the
    # forward kernel: bf16 weights for bf16 activations, f32 exact else)
    w2 = (wy * wx).astype(cot_ref.dtype)               # (TILE, H*W)
    acc = jax.lax.dot_general(
        w2, cot_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (H*W, C) f32

    @pl.when(pt == 0)
    def _init():
        out_ref[0] = acc

    @pl.when(pt > 0)
    def _accum():
        out_ref[0] += acc


def grid_sample_grad_img(grid: jax.Array, cot: jax.Array, H: int, W: int,
                         padding_mode: str = 'border',
                         align_corners: bool = True, tile: int = 512,
                         interpret: bool = False) -> jax.Array:
    """Gradient of bilinear ``grid_sample`` w.r.t. the source image.

    Args:
      grid: (N, Ho, Wo, 2) sample grid, torch [-1,1] convention, (x,y).
      cot:  (N, Ho, Wo, C) output cotangent.
      H, W: source image spatial shape.
    Returns: (N, H, W, C) float32 gradient (cast to the image dtype by the
      caller — f32 accumulation across pixel tiles happens in VMEM).
    """
    assert padding_mode in ('border', 'zeros')
    N, Ho, Wo, C = cot.shape
    P = Ho * Wo
    TILE = min(tile, P)
    pad = (-P) % TILE
    gf = grid.reshape(N, P, 2).astype(jnp.float32)
    cf = cot.reshape(N, P, C)
    if pad:
        # padded cotangent rows are zero, so whatever weights the padded
        # grid rows produce contribute exact zeros to the contraction
        gf = jnp.pad(gf, ((0, 0), (0, pad), (0, 0)))
        cf = jnp.pad(cf, ((0, 0), (0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W, TILE=TILE,
                          padding_mode=padding_mode,
                          align_corners=align_corners),
        grid=(N, (P + pad) // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda n, t: (n, t, 0)),
            pl.BlockSpec((1, TILE, C), lambda n, t: (n, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, H * W, C), lambda n, t: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H * W, C), jnp.float32),
        interpret=interpret,
    )(gf, cf)
    return out.reshape(N, H, W, C)
