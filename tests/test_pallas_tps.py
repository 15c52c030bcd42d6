"""Fused Pallas TPS++ kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles on TPU — exercised by bench.py)."""
import pytest

pytestmark = pytest.mark.heavy
import jax
import jax.numpy as jnp
import numpy as np

from tps_pp_tpu.ops import tps as tps_ops
from tps_pp_tpu.ops.grid_sample import grid_sample
from tps_pp_tpu.ops.pallas_tps import tps_grid_sample_fused


def test_fused_matches_xla_path():
    rng = np.random.default_rng(0)
    N, C = 2, 8
    Hr, Wr = 8, 32           # rectified grid (n = 256)
    Hg, Wg = 16, 64          # full-res reference feature
    Hi, Wi = 8, 32           # stage-2 feature
    point_size = (2, 8)
    F = point_size[0] * point_size[1]

    fid_C = tps_ops.build_C_cell_centers(point_size)
    inv = np.asarray(tps_ops.build_inv_delta_C(fid_C), np.float32)
    P = np.asarray(tps_ops.build_P_cell_centers(Wr, Hr), np.float32)
    P_hat = np.asarray(tps_ops.build_P_hat(fid_C, P), np.float32)

    cp = (fid_C[None] + 0.03 * rng.standard_normal((N, F, 2))).astype(
        np.float32)
    score = np.tanh(rng.standard_normal((N, Hr * Wr, F))).astype(np.float32)
    feat_grid = rng.standard_normal((N, Hg, Wg, C)).astype(np.float32)
    batch_img = rng.standard_normal((N, Hi, Wi, C)).astype(np.float32)

    # XLA reference path
    grid = tps_ops.build_P_prime(jnp.asarray(cp), jnp.asarray(score),
                                 jnp.asarray(inv), jnp.asarray(P_hat),
                                 jnp.asarray(P))
    g = np.asarray(grid).reshape(N, Hr, Wr, 2)
    rect_ref = np.asarray(grid_sample(feat_grid, g, 'border', True))
    mp_ref = np.asarray(grid_sample(batch_img, g, 'border', True))

    rect, mp = tps_grid_sample_fused(
        jnp.asarray(feat_grid), jnp.asarray(batch_img), jnp.asarray(cp),
        jnp.asarray(score), jnp.asarray(inv), jnp.asarray(P_hat),
        jnp.asarray(P), (Hr, Wr), tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(rect), rect_ref, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(mp), mp_ref, rtol=1e-4, atol=1e-4)

    # serving path: with_mp=False skips the (unconsumed) second warp and
    # must leave the rectified feature bit-identical
    rect2, mp2 = tps_grid_sample_fused(
        jnp.asarray(feat_grid), jnp.asarray(batch_img), jnp.asarray(cp),
        jnp.asarray(score), jnp.asarray(inv), jnp.asarray(P_hat),
        jnp.asarray(P), (Hr, Wr), tile=64, interpret=True, with_mp=False)
    assert mp2 is None
    np.testing.assert_array_equal(np.asarray(rect2), np.asarray(rect))

    # the two-stage variant (W-contraction over transposed features + H
    # reduction) must match the same XLA reference
    import os
    os.environ['TPS_SAMPLER_VARIANT'] = 'twostage'
    try:
        rect3, mp3 = tps_grid_sample_fused(
            jnp.asarray(feat_grid), jnp.asarray(batch_img), jnp.asarray(cp),
            jnp.asarray(score), jnp.asarray(inv), jnp.asarray(P_hat),
            jnp.asarray(P), (Hr, Wr), tile=64, interpret=True)
    finally:
        del os.environ['TPS_SAMPLER_VARIANT']
    np.testing.assert_allclose(np.asarray(rect3), rect_ref, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(mp3), mp_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('variant', ['dense', 'twostage'])
def test_fused_matches_xla_path_odd_heights(variant, monkeypatch):
    """Odd feature heights (Hg=15, Hi=7): the twostage variant's H
    reduction must not assume even H (its even-H-only fallback was removed
    in r3; this pins the unrestricted path)."""
    rng = np.random.default_rng(1)
    N, C = 2, 8
    Hr, Wr = 8, 32
    Hg, Wg = 15, 64          # odd full-res height
    Hi, Wi = 7, 32           # odd stage-2 height
    point_size = (2, 8)
    F = point_size[0] * point_size[1]

    fid_C = tps_ops.build_C_cell_centers(point_size)
    inv = np.asarray(tps_ops.build_inv_delta_C(fid_C), np.float32)
    P = np.asarray(tps_ops.build_P_cell_centers(Wr, Hr), np.float32)
    P_hat = np.asarray(tps_ops.build_P_hat(fid_C, P), np.float32)

    cp = (fid_C[None] + 0.03 * rng.standard_normal((N, F, 2))).astype(
        np.float32)
    score = np.tanh(rng.standard_normal((N, Hr * Wr, F))).astype(np.float32)
    feat_grid = rng.standard_normal((N, Hg, Wg, C)).astype(np.float32)
    batch_img = rng.standard_normal((N, Hi, Wi, C)).astype(np.float32)

    grid = tps_ops.build_P_prime(jnp.asarray(cp), jnp.asarray(score),
                                 jnp.asarray(inv), jnp.asarray(P_hat),
                                 jnp.asarray(P))
    g = np.asarray(grid).reshape(N, Hr, Wr, 2)
    rect_ref = np.asarray(grid_sample(feat_grid, g, 'border', True))
    mp_ref = np.asarray(grid_sample(batch_img, g, 'border', True))

    monkeypatch.setenv('TPS_SAMPLER_VARIANT', variant)
    rect, mp = tps_grid_sample_fused(
        jnp.asarray(feat_grid), jnp.asarray(batch_img), jnp.asarray(cp),
        jnp.asarray(score), jnp.asarray(inv), jnp.asarray(P_hat),
        jnp.asarray(P), (Hr, Wr), tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(rect), rect_ref, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(mp), mp_ref, rtol=1e-4, atol=1e-4)
