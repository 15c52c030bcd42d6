"""Pallas grid_sample kernels: bilinear sampling as MXU matmuls, both ways.

XLA lowers the gather formulation of bilinear sampling (ops/grid_sample.py
``_gather_impl``) to 4 gathers forward and a scatter-add backward. On TPU
both are hostile: the scatter-add measured ~420 ms of the flagship's 640 ms
training step at B=512 (66% of training time for <0.3% of its FLOPs), and
the 4 gathers measured 35.2 ms against a ~13 ms matmul equivalent
(scratch/bench_sampler_pieces.py). The reference never sees this cost —
ATen's CUDA ``grid_sample`` forward/backward (reference tps_pp.py:606-615,
tps_stn `grid_sample` in mmocr/models/textrecog/preprocessor/tps_preprocessor.py:280)
gathers/scatters with hardware atomics.

These kernels are the TPU-native formulation, shared with the fused TPS
serving sampler (ops/pallas_tps.py ``_kernel``): build the dense bilinear
interpolation matrix

    W2[p, h*W + w] = hat(gy_p - h) * hat(gx_p - w),   hat(t) = max(0, 1-|t|)

from an integer iota (VPU, no gather), then

  forward:   out[p, c]       = sum_hw W2[p, hw] * img[hw, c]      (MXU)
  d_img:     grad_img[hw, c] = sum_p  W2[p, hw] * cot[p, c]       (MXU,
             accumulated across sample-point tiles — zero scatters)
  d_grid:    Q[p, hw] = sum_c cot[p, c] * img[hw, c]              (MXU)
             d_gx[p]  = sum_hw hat(ty) * hat'(tx) * Q[p, hw]      (VPU)

``hat'`` uses the half-open-interval convention ``1[-1 <= t < 0] -
1[0 <= t < 1]`` so it matches autodiff of the floor-based lerp EVERYWHERE,
including sample points landing exactly on pixel centers (where
``-sign(t) * 1[|t| < 1]`` would give 0 but floor-lerp autodiff gives
``v[x0+1] - v[x0]``). Border mode adds the clipped phantom tap at the top
edge (``w == W-1 and tx == 0``) — the gather path's ``x1`` clamps back onto
``W-1`` there, cancelling the gradient — and masks d_grid to the
pre-clip in-range region like autodiff of ``jnp.clip`` (exact-tie inputs
differ: clip's JVP gives 0.5 at ties, a measure-zero set). Zeros mode
skips the clamp; out-of-range taps fall off the iota range and contribute
nothing, exactly like the forward's in-bounds corner masking.

Every public entry point is wrapped in ``jax.experimental
.custom_partitioning`` declaring the kernel batch-parallel, so the
kernels compose with the jit-auto-sharded training step
(parallel/train.py) over a device mesh — pallas_call alone carries no
SPMD rule and XLA would otherwise fail (or gather the global batch onto
every chip). The per-shard lowering is the same kernel on the batch
shard; non-batch dims are forced replicated.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _vmem_params(interpret):
    """The (TILE, H*W) f32 hat-geometry temporaries exceed Mosaic's default
    16 MB scoped-VMEM stack at flagship scale (tile=256, H*W=4096 measured
    25.01 M in the fused VJP at B=512). Total VMEM is 128 MB and these
    kernels hold no other large buffers — raise the limit like the
    stem/decode kernels do."""
    return (pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
            if not interpret else None)


def _hat_geometry(g, H, W, TILE, padding_mode, align_corners):
    """Shared in-kernel construction: unnormalized (raw + clipped) sample
    coords and the (TILE, H*W) hat-function row/col weight factors."""
    gx_raw = _unnormalize(g[:, 0], W, align_corners)
    gy_raw = _unnormalize(g[:, 1], H, align_corners)
    if padding_mode == 'border':
        gx = jnp.clip(gx_raw, 0.0, W - 1.0)
        gy = jnp.clip(gy_raw, 0.0, H - 1.0)
    else:
        gx, gy = gx_raw, gy_raw
    kk = jax.lax.broadcasted_iota(jnp.int32, (TILE, H * W), 1)
    h_idx = (kk // W).astype(jnp.float32)
    w_idx = (kk % W).astype(jnp.float32)
    ty = gy[:, None] - h_idx
    tx = gx[:, None] - w_idx
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ty))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(tx))
    return gx_raw, gy_raw, h_idx, w_idx, ty, tx, wy, wx


def _dhat(t):
    """d/dg hat(g - k), matching floor-lerp autodiff at pixel centers."""
    return (((t >= -1.0) & (t < 0.0)).astype(jnp.float32)
            - ((t >= 0.0) & (t < 1.0)).astype(jnp.float32))


# ---------------------------------------------------------------- forward

def _fwd_kernel(grid_ref, img_ref, out_ref, *, H, W, TILE,
                padding_mode, align_corners):
    *_, wy, wx = _hat_geometry(grid_ref[0], H, W, TILE,
                               padding_mode, align_corners)
    # weight precision matches the image dtype (same policy as the fused
    # TPS sampler: bf16 weights for bf16 activations, f32 exact else)
    w2 = (wy * wx).astype(img_ref.dtype)               # (TILE, H*W)
    out_ref[0] = jax.lax.dot_general(
        w2, img_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _fwd_raw(img, grid, padding_mode, align_corners, tile, interpret):
    N, H, W, C = img.shape
    Ho, Wo = grid.shape[1], grid.shape[2]
    P_ = Ho * Wo
    TILE = min(tile, P_)
    pad = (-P_) % TILE
    gf = grid.reshape(N, P_, 2).astype(jnp.float32)
    if pad:
        gf = jnp.pad(gf, ((0, 0), (0, pad), (0, 0)))
    imf = img.reshape(N, H * W, C)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W, TILE=TILE,
                          padding_mode=padding_mode,
                          align_corners=align_corners),
        grid=(N, (P_ + pad) // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda n, t: (n, t, 0)),
            pl.BlockSpec((1, H * W, C), lambda n, t: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, C), lambda n, t: (n, t, 0)),
        out_shape=jax.ShapeDtypeStruct((N, P_ + pad, C), img.dtype),
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(gf, imf)
    return out[:, :P_].reshape(N, Ho, Wo, C)


# ----------------------------------------------------- backward, d_img only
# (kept as the minimal/reference kernel; the VJP uses the fused one below)

def _bwd_kernel(grid_ref, cot_ref, out_ref, *, H, W, TILE,
                padding_mode, align_corners):
    pt = pl.program_id(1)
    *_, wy, wx = _hat_geometry(grid_ref[0], H, W, TILE,
                               padding_mode, align_corners)
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


def _grad_img_raw(grid, cot, H, W, padding_mode, align_corners, tile,
                  interpret):
    N, Ho, Wo, C = cot.shape
    P_ = Ho * Wo
    TILE = min(tile, P_)
    pad = (-P_) % TILE
    gf = grid.reshape(N, P_, 2).astype(jnp.float32)
    cf = cot.reshape(N, P_, C)
    if pad:
        # padded cotangent rows are zero, so whatever weights the padded
        # grid rows produce contribute exact zeros to the contraction
        gf = jnp.pad(gf, ((0, 0), (0, pad), (0, 0)))
        cf = jnp.pad(cf, ((0, 0), (0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W, TILE=TILE,
                          padding_mode=padding_mode,
                          align_corners=align_corners),
        grid=(N, (P_ + pad) // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda n, t: (n, t, 0)),
            pl.BlockSpec((1, TILE, C), lambda n, t: (n, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, H * W, C), lambda n, t: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H * W, C), jnp.float32),
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(gf, cf)
    return out.reshape(N, H, W, C)


@functools.lru_cache(maxsize=None)
def _partitioned_grad_img(H, W, padding_mode, align_corners, tile,
                          interpret):
    def impl(grid, cot):
        return _grad_img_raw(grid, cot, H, W, padding_mode, align_corners,
                             tile, interpret)
    return _def_batch_partition(custom_partitioning(impl), impl,
                                'n ho wo k, n ho wo c -> n h w c')


def grid_sample_grad_img(grid: jax.Array, cot: jax.Array, H: int, W: int,
                         padding_mode: str = 'border',
                         align_corners: bool = True, tile: int = 512,
                         interpret: bool = False) -> jax.Array:
    """Gradient of bilinear ``grid_sample`` w.r.t. the source image only
    (minimal/reference kernel; the library VJP uses ``grid_sample_grad``).
    Batch-parallel under jit auto-sharding (custom_partitioning).

    Args:
      grid: (N, Ho, Wo, 2) sample grid, torch [-1,1] convention, (x,y).
      cot:  (N, Ho, Wo, C) output cotangent.
      H, W: source image spatial shape.
    Returns: (N, H, W, C) float32 gradient (cast to the image dtype by the
      caller — f32 accumulation across pixel tiles happens in VMEM).
    """
    assert padding_mode in ('border', 'zeros')
    return _partitioned_grad_img(H, W, padding_mode, align_corners, tile,
                                 interpret)(grid, cot)


# ------------------------------------------------ backward, fused full VJP

def _bwd_fused_kernel(grid_ref, cot_ref, img_ref, dimg_ref, dgrid_ref, *,
                      H, W, TILE, padding_mode, align_corners):
    pt = pl.program_id(1)
    (gx_raw, gy_raw, h_idx, w_idx, ty, tx, wy, wx) = _hat_geometry(
        grid_ref[0], H, W, TILE, padding_mode, align_corners)
    cot = cot_ref[0]                                   # (TILE, C)
    w2 = (wy * wx).astype(cot.dtype)                   # (TILE, H*W)
    acc = jax.lax.dot_general(
        w2, cot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (H*W, C) f32

    @pl.when(pt == 0)
    def _init():
        dimg_ref[0] = acc

    @pl.when(pt > 0)
    def _accum():
        dimg_ref[0] += acc

    # Q[p, hw] = <cot_p, img_hw>: the image content each tap would pull
    q = jax.lax.dot_general(
        cot, img_ref[0].astype(cot.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TILE, H*W) f32
    dwx = _dhat(tx)
    dwy = _dhat(ty)
    if padding_mode == 'border':
        # clipped phantom tap: the gather path's x1 = W clamps back onto
        # W-1, cancelling the top-edge gradient at gx == W-1 exactly
        dwx += ((w_idx == W - 1.0) & (tx == 0.0)).astype(jnp.float32)
        dwy += ((h_idx == H - 1.0) & (ty == 0.0)).astype(jnp.float32)
    dgx = jnp.sum(wy * dwx * q, axis=1)                # (TILE,)
    dgy = jnp.sum(dwy * wx * q, axis=1)
    if padding_mode == 'border':
        # autodiff of clip: zero outside the pre-clip in-range region
        dgx *= ((gx_raw >= 0.0) & (gx_raw <= W - 1.0)).astype(jnp.float32)
        dgy *= ((gy_raw >= 0.0) & (gy_raw <= H - 1.0)).astype(jnp.float32)
    sx = (W - 1) * 0.5 if align_corners else W * 0.5
    sy = (H - 1) * 0.5 if align_corners else H * 0.5
    dgrid_ref[0] = jnp.stack([dgx * sx, dgy * sy], axis=-1)


def _bwd_fused_raw(grid, cot, img, padding_mode, align_corners, tile,
                   interpret):
    N, H, W, C = img.shape
    Ho, Wo = grid.shape[1], grid.shape[2]
    P_ = Ho * Wo
    TILE = min(tile, P_)
    pad = (-P_) % TILE
    gf = grid.reshape(N, P_, 2).astype(jnp.float32)
    cf = cot.reshape(N, P_, C)
    if pad:
        # padded cotangent rows are zero: exact zeros into d_img, and the
        # padded d_grid rows are sliced off below
        gf = jnp.pad(gf, ((0, 0), (0, pad), (0, 0)))
        cf = jnp.pad(cf, ((0, 0), (0, pad), (0, 0)))
    imf = img.reshape(N, H * W, C)
    d_img, d_grid = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, H=H, W=W, TILE=TILE,
                          padding_mode=padding_mode,
                          align_corners=align_corners),
        grid=(N, (P_ + pad) // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda n, t: (n, t, 0)),
            pl.BlockSpec((1, TILE, C), lambda n, t: (n, t, 0)),
            pl.BlockSpec((1, H * W, C), lambda n, t: (n, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, H * W, C), lambda n, t: (n, 0, 0)),
            pl.BlockSpec((1, TILE, 2), lambda n, t: (n, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H * W, C), jnp.float32),
            jax.ShapeDtypeStruct((N, P_ + pad, 2), jnp.float32),
        ],
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(gf, cf, imf)
    return (d_img.reshape(N, H, W, C),
            d_grid[:, :P_].reshape(N, Ho, Wo, 2))


# --------------------------------------- batch-parallel SPMD partitioning

def _batch_only(ns, mesh, ndim):
    """Project a proposed sharding onto batch-dim-only (dim 0)."""
    spec = ns.spec if ns is not None else P()
    b = spec[0] if len(spec) > 0 else None
    return NamedSharding(mesh, P(b, *([None] * (ndim - 1))))


def _def_batch_partition(f, impl, rule):
    """Declare ``impl`` batch-parallel: per-shard lowering is the same
    kernel on the batch shard; non-batch dims are forced replicated."""

    def partition(mesh, arg_shapes, result_shape):
        results = (result_shape if isinstance(result_shape, (list, tuple))
                   else [result_shape])
        # take the batch axes XLA proposes for the first result and force
        # every operand/result onto batch-only sharding
        b = _batch_only(results[0].sharding, mesh, 1)
        arg_sh = tuple(_batch_only(b, mesh, len(a.shape))
                       for a in arg_shapes)
        res_sh = [_batch_only(b, mesh, len(r.shape)) for r in results]
        if not isinstance(result_shape, (list, tuple)):
            res_sh = res_sh[0]
        else:
            res_sh = tuple(res_sh)
        return mesh, impl, res_sh, arg_sh

    def infer(mesh, arg_shapes, result_shape):
        b = _batch_only(arg_shapes[0].sharding, mesh, 1)
        results = (result_shape if isinstance(result_shape, (list, tuple))
                   else [result_shape])
        out = [_batch_only(b, mesh, len(r.shape)) for r in results]
        if not isinstance(result_shape, (list, tuple)):
            return out[0]
        return tuple(out)

    f.def_partition(partition=partition,
                    infer_sharding_from_operands=infer,
                    sharding_rule=rule)
    return f


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(padding_mode, align_corners, tile, interpret):
    def impl(img, grid):
        return _fwd_raw(img, grid, padding_mode, align_corners, tile,
                        interpret)
    return _def_batch_partition(custom_partitioning(impl), impl,
                                'n h w c, n ho wo k -> n ho wo c')


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(padding_mode, align_corners, tile, interpret):
    def impl(grid, cot, img):
        return _bwd_fused_raw(grid, cot, img, padding_mode, align_corners,
                              tile, interpret)
    return _def_batch_partition(
        custom_partitioning(impl), impl,
        'n ho wo k, n ho wo c, n h w c -> n h w c, n ho wo k')


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != 'tpu'
    return interpret


def grid_sample_pallas(img: jax.Array, grid: jax.Array,
                       padding_mode: str = 'border',
                       align_corners: bool = True, tile: int = 512,
                       interpret: bool | None = None) -> jax.Array:
    """Bilinear sampling forward as one interpolation matmul per
    (batch row, sample tile). Same semantics as ``_gather_impl``; values
    agree to bf16/f32 rounding (tests/test_grid_sample_vjp.py). Batch-
    parallel under jit auto-sharding (custom_partitioning)."""
    assert padding_mode in ('border', 'zeros')
    return _partitioned_fwd(padding_mode, align_corners, tile,
                            _auto_interpret(interpret))(img, grid)


def grid_sample_grad(grid: jax.Array, cot: jax.Array, img: jax.Array,
                     padding_mode: str = 'border',
                     align_corners: bool = True, tile: int = 256,
                     interpret: bool | None = None):
    """Full ``grid_sample`` VJP in one fused kernel: (d_img f32 (N,H,W,C),
    d_grid f32 (N,Ho,Wo,2)). The hat-weight construction is shared between
    the d_img contraction and the d_grid tap derivatives; Q = cot @ img^T
    is the only extra MXU work. Batch-parallel under jit auto-sharding."""
    assert padding_mode in ('border', 'zeros')
    return _partitioned_bwd(padding_mode, align_corners, tile,
                            _auto_interpret(interpret))(grid, cot, img)
