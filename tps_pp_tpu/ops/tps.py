"""Thin-plate-spline solver math shared by TPS++ and classic TPS-STN.

Static matrices (fiducial layout C, inverted system matrix inv_delta_C, RBF
matrix P_hat) are precomputed with NumPy at module-construction time — the
reference does the same with buffers (tps_pp.py:357-366; tps_preprocessor.py:
179-188). The per-batch work (score modulation + two small matmuls) runs in
XLA on the MXU.

Two coordinate conventions exist in the reference and are both supported:
  * TPS++  — fiducials/pixels at **cell centers in [0,1]**
    (tps_pp.py:376-378, 442-447), kernel ``r^2 log(r+eps)`` with eps inside
    the log for P_hat (tps_pp.py:463) and ``fill_diagonal(1)`` before
    ``r^2 log r`` for C-C distances (tps_pp.py:390).
  * RARE TPS-STN — fiducials on top/bottom borders in **[-1,1]**
    (tps_preprocessor.py:126-139), same kernel structure.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def build_C_cell_centers(point_size) -> np.ndarray:
    """TPS++ fiducials: (point_y*point_x, 2) cell centers in [0,1]
    (reference tps_pp.py:368-380). Row-major over (y, x); last dim (x, y)."""
    py, px = point_size
    cx = (np.linspace(0.5, px - 0.5, num=int(px)) / px)
    cy = (np.linspace(0.5, py - 0.5, num=int(py)) / py)
    return np.stack(np.meshgrid(cx, cy), axis=2).reshape(-1, 2)


def build_C_border(num_fiducial: int) -> np.ndarray:
    """RARE fiducials: num_fiducial/2 points along the top edge (y=-1) then
    bottom edge (y=+1), x in [-1,1] (reference tps_preprocessor.py:152-163)."""
    half = num_fiducial // 2
    x = np.linspace(-1.0, 1.0, num=half)
    top = np.stack([x, -1 * np.ones(half)], axis=1)
    bottom = np.stack([x, np.ones(half)], axis=1)
    return np.concatenate([top, bottom], axis=0)


def tps_kernel_matrix_C(C: np.ndarray) -> np.ndarray:
    """(F, F) pairwise r^2 log r with diagonal distance forced to 1
    (=> kernel 0 on the diagonal). Reference tps_pp.py:382-391."""
    F = C.shape[0]
    d = np.linalg.norm(C[:, None, :] - C[None, :, :], axis=2)
    np.fill_diagonal(d, 1.0)
    return (d ** 2) * np.log(d)


def build_inv_delta_C(C: np.ndarray) -> np.ndarray:
    """Invert the (F+3, F+3) TPS system matrix (reference tps_pp.py:393-405
    and tps_preprocessor.py:190-209)."""
    F = C.shape[0]
    hat_C = tps_kernel_matrix_C(C)
    delta_C = np.concatenate([
        np.concatenate([np.ones((F, 1)), C, hat_C], axis=1),
        np.concatenate([np.zeros((2, 3)), C.T], axis=1),
        np.concatenate([np.zeros((1, 3)), np.ones((1, F))], axis=1),
    ], axis=0)
    return np.linalg.inv(delta_C)


def build_P_cell_centers(width: int, height: int) -> np.ndarray:
    """TPS++ target pixels: (H*W, 2) cell centers in [0,1], row-major (y,x),
    last dim (x, y). Reference tps_pp.py:437-450."""
    gx = np.linspace(0.5, width - 0.5, num=int(width)) / width
    gy = np.linspace(0.5, height - 0.5, num=int(height)) / height
    return np.stack(np.meshgrid(gx, gy), axis=2).reshape(-1, 2)


def build_P_minus1_1(width: int, height: int) -> np.ndarray:
    """RARE target pixels: pixel centers in [-1,1]
    (reference tps_preprocessor.py:211-219)."""
    gx = (np.arange(-width, width, 2) + 1.0) / width
    gy = (np.arange(-height, height, 2) + 1.0) / height
    return np.stack(np.meshgrid(gx, gy), axis=2).reshape(-1, 2)


def build_P_hat(C: np.ndarray, P: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """(n, F) RBF matrix: r^2 * log(r + eps). Reference tps_pp.py:452-465 /
    tps_preprocessor.py:221-238 (identical structure)."""
    diff = P[:, None, :] - C[None, :, :]
    r = np.linalg.norm(diff, ord=2, axis=2)
    return np.square(r) * np.log(r + eps)


@functools.partial(jax.jit, static_argnames=())
def build_P_prime(control_points: jax.Array, pc_score: jax.Array,
                  inv_delta_C: jax.Array, P_hat: jax.Array, P: jax.Array,
                  theta: float = 0.5) -> jax.Array:
    """Attention-enhanced TPS grid generation (reference tps_pp.py:467-496).

    Args:
      control_points: (N, F, 2) predicted fiducials C'.
      pc_score: (N, n, F) pixel-to-fiducial attention in [-1,1] (tanh).
      inv_delta_C: (F+3, F+3) static.
      P_hat: (n, F) static RBF matrix.
      P: (n, 2) static target pixel coordinates.
      theta: score-modulation strength (reference ``thela=0.5``, tps_pp.py:342).
    Returns: (N, n, 2) sampling grid P'.
    """
    N = control_points.shape[0]
    n, F = P_hat.shape
    dt = control_points.dtype
    # P_hat * (score*theta + 1), then concat [1 | P | P_hat] -> (N, n, F+3)
    P_hat_mod = P_hat[None] * (pc_score * theta + 1.0)
    ones = jnp.ones((N, n, 1), dtype=dt)
    P_b = jnp.broadcast_to(P[None].astype(dt), (N, n, 2))
    P_hat_full = jnp.concatenate([ones, P_b, P_hat_mod.astype(dt)], axis=2)
    # T = inv_delta_C @ [C'; 0_{3x2}]  -> (N, F+3, 2)
    Cp = jnp.concatenate(
        [control_points, jnp.zeros((N, 3, 2), dtype=dt)], axis=1)
    T = jnp.einsum('ij,njk->nik', inv_delta_C.astype(dt), Cp,
                   preferred_element_type=jnp.float32).astype(dt)
    # P' = P_hat_full @ T -> (N, n, 2)
    return jnp.einsum('nij,njk->nik', P_hat_full, T,
                      preferred_element_type=jnp.float32).astype(dt)


def build_P_prime_plain(control_points: jax.Array, inv_delta_C: jax.Array,
                        P_hat_full: jax.Array) -> jax.Array:
    """Classic (un-modulated) TPS grid generation for RARE TPS-STN
    (reference tps_preprocessor.py:270-282). ``P_hat_full`` is the static
    (n, F+3) [1 | P | P_hat] matrix."""
    N = control_points.shape[0]
    dt = control_points.dtype
    Cp = jnp.concatenate(
        [control_points, jnp.zeros((N, 3, 2), dtype=dt)], axis=1)
    T = jnp.einsum('ij,njk->nik', inv_delta_C.astype(dt), Cp,
                   preferred_element_type=jnp.float32).astype(dt)
    return jnp.einsum('ij,njk->nik', P_hat_full.astype(dt), T,
                      preferred_element_type=jnp.float32).astype(dt)
