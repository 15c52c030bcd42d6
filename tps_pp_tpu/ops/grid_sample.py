"""Bilinear grid sampling (torch ``F.grid_sample`` semantics) in pure XLA.

The reference's rectifiers all lean on the ATen CUDA ``grid_sample`` kernel
(TPS++ at reference ``tps_pp.py:606-615``; classic TPS-STN at
``tps_preprocessor.py:79-83``; MORAN/SPIN likewise). This module provides the
TPU equivalent:

* ``grid_sample`` — faithful ``align_corners=True/False`` + ``border``/
  ``zeros`` padding bilinear sampler built on gathers + lerp. Grid values are
  in [-1, 1] (torch convention). NHWC layout.
* ``grid_sample_onehot`` — the same math expressed as two MXU matmul-like
  contractions against interpolation weight matrices (no gather at all),
  which XLA maps straight onto the systolic array. Used by the fused TPS++
  path where the output grid is small (16x64) and the batch is large.

Behavioral quirk preserved on purpose: TPS++ feeds grids in **[0, 1]** to a
sampler expecting [-1, 1] (reference tps_pp.py:606-615 and SURVEY §2.3). We do
NOT bake that in here — callers pass the grid through unchanged, exactly as
the reference does, so converted checkpoints behave identically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    """Map grid value in [-1,1] to pixel coordinate."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_impl(img: jax.Array, grid: jax.Array, padding_mode: str,
                 align_corners: bool) -> jax.Array:
    """Gather+lerp sampling (torch semantics); autodiffable but its
    image-gradient lowers to a TPU-hostile scatter-add — ``grid_sample``
    wraps it with a custom VJP that routes that cotangent through the
    matmul-based Pallas kernel instead (ops/pallas_grid_sample.py)."""
    assert padding_mode in ("border", "zeros")
    N, H, W, C = img.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)

    if padding_mode == "border":
        gx = jnp.clip(gx, 0.0, W - 1)
        gy = jnp.clip(gy, 0.0, H - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        flat = img.reshape(N, H * W, C)
        idx = (yc * W + xc).reshape(N, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals.reshape(*yi.shape, C)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    if padding_mode == "zeros":
        # zero out contributions from out-of-bounds corners (torch semantics)
        def inb(yi, xi):
            return ((yi >= 0) & (yi <= H - 1) & (xi >= 0) &
                    (xi <= W - 1)).astype(v00.dtype)[..., None]
        out = ((v00 * inb(y0i, x0i) * (1 - wx) + v01 * inb(y0i, x1i) * wx) *
               (1 - wy) +
               (v10 * inb(y1i, x0i) * (1 - wx) + v11 * inb(y1i, x1i) * wx) *
               wy)
    else:
        out = ((v00 * (1 - wx) + v01 * wx) * (1 - wy) +
               (v10 * (1 - wx) + v11 * wx) * wy)
    return out.astype(img.dtype)


# tests flip these to exercise the Pallas forward/backward (interpret
# mode) on the 8-virtual-device CPU mesh — the TPU branches are otherwise
# invisible to CI
_FORCE_PALLAS_BWD = False
_FORCE_PALLAS_FWD = False


def _sample_impl(img, grid, padding_mode, align_corners):
    """Primal: on TPU the 4-gather formulation measured 35.2 ms vs ~13 ms
    for the interpolation-matmul Pallas kernel at flagship train scale
    (scratch/bench_sampler_pieces.py), so the forward rides the kernel
    there too; CPU/GPU keep the cheap native gathers."""
    if jax.default_backend() == 'tpu' or _FORCE_PALLAS_FWD:
        from .pallas_grid_sample import grid_sample_pallas
        return grid_sample_pallas(img, grid, padding_mode, align_corners)
    return _gather_impl(img, grid, padding_mode, align_corners)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grid_sample_vjp(img, grid, padding_mode, align_corners):
    return _sample_impl(img, grid, padding_mode, align_corners)


def _grid_sample_fwd(img, grid, padding_mode, align_corners):
    return _sample_impl(img, grid, padding_mode, align_corners), (img, grid)


def _grid_sample_bwd(padding_mode, align_corners, res, g):
    img, grid = res
    if jax.default_backend() == 'tpu' or _FORCE_PALLAS_BWD:
        # Both cotangents from the fused transpose-interpolation Pallas
        # kernel (ops/pallas_grid_sample.py grid_sample_grad). d_img as an
        # XLA scatter-add measured ~420 ms of the 640 ms flagship train
        # step at B=512 (scratch/profile_train.py); d_grid as autodiff of
        # the gather formulation re-gathers the image 4x. The kernel is
        # wrapped in custom_partitioning (batch-parallel), so this VJP
        # composes with the jit-auto-sharded train step on a mesh.
        from .pallas_grid_sample import grid_sample_grad
        d_img, d_grid = grid_sample_grad(
            grid, g, img, padding_mode, align_corners)
        return d_img.astype(img.dtype), d_grid
    _, pull_grid = jax.vjp(
        lambda gr: _gather_impl(img, gr, padding_mode, align_corners), grid)
    (d_grid,) = pull_grid(g)
    _, pull_img = jax.vjp(
        lambda im: _gather_impl(im, grid, padding_mode, align_corners), img)
    (d_img,) = pull_img(g)
    return d_img, d_grid


_grid_sample_vjp.defvjp(_grid_sample_fwd, _grid_sample_bwd)


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners"))
def grid_sample(img: jax.Array, grid: jax.Array, padding_mode: str = "border",
                align_corners: bool = True) -> jax.Array:
    """Sample ``img`` (N,H,W,C) at ``grid`` (N,Ho,Wo,2) [(x,y) order, torch
    convention]. Returns (N,Ho,Wo,C).

    Forward = gather+lerp (cheap on every backend). Backward w.r.t. the
    image rides a Pallas matmul kernel on TPU (custom VJP above); CPU/GPU
    keep plain autodiff. Values and gradients agree across paths
    (tests/test_grid_sample_vjp.py)."""
    return _grid_sample_vjp(img, grid, padding_mode, align_corners)


def interp_weight_matrix(coords: jax.Array, size: int) -> jax.Array:
    """Build the (n, size) bilinear interpolation matrix for clamped pixel
    coordinates: row p holds hat-function weights ``relu(1 - |c_p - j|)``.

    For in-range coords each row has <=2 non-zeros summing to 1, so
    ``weights @ signal`` reproduces gather+lerp exactly — but as an MXU
    matmul instead of a gather (TPU-friendly)."""
    c = jnp.clip(coords.astype(jnp.float32), 0.0, size - 1)
    j = jax.lax.broadcasted_iota(jnp.float32, (coords.shape[-1], size), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - j))


@functools.partial(jax.jit, static_argnames=("align_corners",))
def grid_sample_onehot(img: jax.Array, grid_flat: jax.Array,
                       align_corners: bool = True) -> jax.Array:
    """Gather-free bilinear sampling via interpolation-matrix contractions.

    Args:
      img: (N, H, W, C)
      grid_flat: (N, P, 2) grid points, torch [-1,1] convention, (x,y) order,
        border padding semantics.
    Returns: (N, P, C)
    """
    N, H, W, C = img.shape
    gx = _unnormalize(grid_flat[..., 0], W, align_corners)
    gy = _unnormalize(grid_flat[..., 1], H, align_corners)
    ry = jax.vmap(lambda c: interp_weight_matrix(c, H))(gy)   # (N,P,H)
    rx = jax.vmap(lambda c: interp_weight_matrix(c, W))(gx)   # (N,P,W)
    # (N,P,H) @ (N,H,W*C) -> (N,P,W*C): one big MXU batched matmul
    tmp = jax.lax.dot_general(
        ry, img.reshape(N, H, W * C).astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    tmp = tmp.reshape(N, -1, W, C)
    out = jnp.sum(tmp * rx[..., None], axis=2)
    return out.astype(img.dtype)
