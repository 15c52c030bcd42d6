"""grid_sample custom-VJP parity: the Pallas matmul backward (TPU training
path, ops/pallas_grid_sample.py) must match plain autodiff of the gather
formulation — which itself is torch-parity-tested via the rectifiers
(tests/test_reference_parity.py, test_grad_parity.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tps_pp_tpu.ops.grid_sample as gs_mod
from tps_pp_tpu.ops.grid_sample import _gather_impl, grid_sample
from tps_pp_tpu.ops.pallas_grid_sample import (grid_sample_grad,
                                               grid_sample_grad_img)

MODES = [('border', True), ('border', False),
         ('zeros', True), ('zeros', False)]


def _case(seed=0, N=2, H=7, W=13, C=5, Ho=4, Wo=6, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((N, H, W, C)), dtype)
    # cover in-range, near-edge and out-of-range sample points
    grid = jnp.asarray(rng.uniform(-1.3, 1.3, (N, Ho, Wo, 2)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((N, Ho, Wo, C)), dtype)
    return img, grid, cot


@pytest.mark.parametrize('padding_mode,align_corners', MODES)
def test_custom_vjp_matches_autodiff(padding_mode, align_corners):
    """On CPU the custom VJP takes the XLA branch — grads must equal raw
    autodiff of the gather impl up to summation-order rounding (the
    custom bwd pulls the two cotangents through separate vjp closures)."""
    img, grid, cot = _case()

    def raw(im, gr):
        return jnp.sum(_gather_impl(im, gr, padding_mode, align_corners)
                       * cot)

    def custom(im, gr):
        return jnp.sum(grid_sample(im, gr, padding_mode=padding_mode,
                                   align_corners=align_corners) * cot)

    gi_raw, gg_raw = jax.grad(raw, argnums=(0, 1))(img, grid)
    gi_c, gg_c = jax.grad(custom, argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(gi_raw), np.asarray(gi_c),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gg_raw), np.asarray(gg_c),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('padding_mode,align_corners', MODES)
def test_pallas_grad_img_matches_autodiff(padding_mode, align_corners):
    """The Pallas transpose-interpolation kernel (interpret mode on CPU)
    vs the scatter-add XLA gradient, odd sizes included."""
    img, grid, cot = _case()

    def raw(im):
        return jnp.sum(_gather_impl(im, grid, padding_mode, align_corners)
                       * cot)

    gi_raw = jax.grad(raw)(img)
    gi_pl = grid_sample_grad_img(grid, cot, img.shape[1], img.shape[2],
                                 padding_mode, align_corners,
                                 interpret=True).astype(img.dtype)
    np.testing.assert_allclose(np.asarray(gi_pl), np.asarray(gi_raw),
                               rtol=1e-5, atol=1e-5)


def test_pallas_grad_img_tiled_accumulation():
    """More sample points than one tile: the revisited-output-block
    accumulation across pixel tiles must sum correctly."""
    img, grid, cot = _case(seed=3, Ho=16, Wo=24)   # P=384, tile 128 -> 3
    gi_pl = grid_sample_grad_img(grid, cot, img.shape[1], img.shape[2],
                                 tile=128, interpret=True)
    gi_one = grid_sample_grad_img(grid, cot, img.shape[1], img.shape[2],
                                  tile=384, interpret=True)

    def raw(im):
        return jnp.sum(_gather_impl(im, grid, 'border', True) * cot)

    gi_raw = jax.grad(raw)(img)
    np.testing.assert_allclose(np.asarray(gi_pl), np.asarray(gi_raw),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gi_pl), np.asarray(gi_one),
                               rtol=1e-6, atol=1e-6)


def test_pallas_grad_img_nondivisible_tile_padding():
    """P not a multiple of the tile: zero-padded cotangent rows must
    contribute nothing."""
    img, grid, cot = _case(seed=4, Ho=5, Wo=7)     # P=35, tile 16 -> pad 13
    gi_pl = grid_sample_grad_img(grid, cot, img.shape[1], img.shape[2],
                                 tile=16, interpret=True)

    def raw(im):
        return jnp.sum(_gather_impl(im, grid, 'border', True) * cot)

    gi_raw = jax.grad(raw)(img)
    np.testing.assert_allclose(np.asarray(gi_pl), np.asarray(gi_raw),
                               rtol=1e-5, atol=1e-5)


def test_value_unchanged_by_custom_vjp():
    img, grid, _ = _case(seed=5)
    for pm, ac in MODES:
        np.testing.assert_allclose(
            np.asarray(grid_sample(img, grid, padding_mode=pm,
                                   align_corners=ac)),
            np.asarray(_gather_impl(img, grid, pm, ac)),
            rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('padding_mode,align_corners', MODES)
def test_fused_grad_matches_autodiff(padding_mode, align_corners):
    """The fused full-VJP kernel (d_img AND d_grid — the training-path
    backward on TPU) vs raw autodiff of the gather formulation."""
    img, grid, cot = _case(seed=7)

    def raw(im, gr):
        return jnp.sum(_gather_impl(im, gr, padding_mode, align_corners)
                       * cot)

    gi_raw, gg_raw = jax.grad(raw, argnums=(0, 1))(img, grid)
    gi_pl, gg_pl = grid_sample_grad(grid, cot, img, padding_mode,
                                    align_corners, interpret=True)
    np.testing.assert_allclose(np.asarray(gi_pl), np.asarray(gi_raw),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg_pl), np.asarray(gg_raw),
                               rtol=1e-4, atol=1e-5)


def test_fused_grad_tiled_and_nondivisible():
    """Fused kernel with P spanning several non-divisible tiles: d_img
    accumulates across tiles; padded d_grid rows are sliced off."""
    img, grid, cot = _case(seed=8, Ho=9, Wo=13)    # P=117, tile 32 -> pad 11

    def raw(im, gr):
        return jnp.sum(_gather_impl(im, gr, 'border', True) * cot)

    gi_raw, gg_raw = jax.grad(raw, argnums=(0, 1))(img, grid)
    gi_pl, gg_pl = grid_sample_grad(grid, cot, img, tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(gi_pl), np.asarray(gi_raw),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg_pl), np.asarray(gg_raw),
                               rtol=1e-4, atol=1e-5)


def test_fused_grad_pixel_center_taps():
    """Sample points landing exactly on pixel centers: _dhat's half-open
    intervals must match floor-lerp autodiff (not the sign convention)."""
    img, _, _ = _case(seed=9, H=5, W=9, Ho=1, Wo=1)
    N, H, W, C = img.shape
    # grid hitting INTERIOR integer pixel coords under align_corners=True:
    # pixel p maps from g = 2p/(size-1) - 1. Image corners are excluded on
    # purpose — they sit exactly on the border-mode clip boundary, where
    # autodiff of jnp.clip gives the 0.5 tie JVP but the kernel's inclusive
    # in-range mask gives 1.0 (documented measure-zero divergence,
    # ops/pallas_grid_sample.py module docstring).
    px = np.array([1, 4, W - 2], np.float32)
    py = np.array([1, 2, H - 2], np.float32)
    pts = np.stack(np.meshgrid(2 * px / (W - 1) - 1, 2 * py / (H - 1) - 1),
                   axis=-1).reshape(1, 3, 3, 2)
    grid = jnp.asarray(np.repeat(pts, N, axis=0))
    rng = np.random.default_rng(10)
    cot = jnp.asarray(rng.standard_normal((N, 3, 3, C)), jnp.float32)

    for pm in ('border', 'zeros'):
        def raw(im, gr):
            return jnp.sum(_gather_impl(im, gr, pm, True) * cot)

        gi_raw, gg_raw = jax.grad(raw, argnums=(0, 1))(img, grid)
        gi_pl, gg_pl = grid_sample_grad(grid, cot, img, pm, True,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(gi_pl), np.asarray(gi_raw),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gg_pl), np.asarray(gg_raw),
                                   rtol=1e-4, atol=1e-5)


def test_fused_grad_bf16():
    img, grid, cot = _case(seed=11, dtype=jnp.bfloat16)
    gi_pl, gg_pl = grid_sample_grad(grid, cot, img, interpret=True)

    def raw(im, gr):
        return jnp.sum(_gather_impl(im, gr, 'border', True)
                       .astype(jnp.float32) * cot.astype(jnp.float32))

    gi_raw, gg_raw = jax.grad(raw, argnums=(0, 1))(
        img.astype(jnp.float32), grid)
    np.testing.assert_allclose(np.asarray(gi_pl), np.asarray(gi_raw),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(gg_pl), np.asarray(gg_raw),
                               rtol=0.05, atol=0.1)


def test_pallas_bwd_under_sharded_jit():
    """The ADVICE-flagged gap: the Pallas backward inside a jit-auto-
    sharded step over a multi-device mesh. Forces the Pallas VJP branch
    (interpret mode on the 8 virtual CPU devices), shards the batch, and
    checks gradients equal the single-device autodiff path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    img, grid, cot = _case(seed=12, N=8)
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = Mesh(np.array(devs).reshape(8), ('data',))
    shard = NamedSharding(mesh, P('data'))

    def loss(im, gr):
        return jnp.sum(grid_sample(im, gr) * cot)

    gi_ref, gg_ref = jax.grad(loss, argnums=(0, 1))(img, grid)

    old = gs_mod._FORCE_PALLAS_BWD
    old_f = gs_mod._FORCE_PALLAS_FWD
    # force BOTH kernel branches: on TPU the primal rides grid_sample_pallas
    # inside the same auto-sharded step, so its custom_partitioning rule
    # needs the identical mesh coverage
    gs_mod._FORCE_PALLAS_BWD = True
    gs_mod._FORCE_PALLAS_FWD = True
    jax.clear_caches()   # drop traces that baked in the autodiff branch
    try:
        cot_sh = jax.device_put(cot, shard)

        def loss_sh(im, gr):
            return jnp.sum(grid_sample(im, gr) * cot_sh)

        step = jax.jit(jax.grad(loss_sh, argnums=(0, 1)),
                       in_shardings=(shard, shard))
        gi_sh, gg_sh = step(jax.device_put(img, shard),
                            jax.device_put(grid, shard))
    finally:
        gs_mod._FORCE_PALLAS_BWD = old
        gs_mod._FORCE_PALLAS_FWD = old_f
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(gi_sh), np.asarray(gi_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg_sh), np.asarray(gg_ref),
                               rtol=1e-4, atol=1e-5)


def test_bf16_cotangent_path():
    """bf16 activations (the training dtype): kernel takes bf16 weights
    with f32 accumulation — tolerance matches the forward kernel's
    documented bf16 drift."""
    img, grid, cot = _case(seed=6, dtype=jnp.bfloat16)
    gi_pl = grid_sample_grad_img(grid, cot, img.shape[1], img.shape[2],
                                 interpret=True)

    def raw(im):
        return jnp.sum(_gather_impl(im, grid, 'border', True)
                       .astype(jnp.float32) * cot.astype(jnp.float32))

    gi_raw = jax.grad(raw)(img.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(gi_pl), np.asarray(gi_raw),
                               rtol=0.05, atol=0.05)


def test_pallas_fwd_primal_and_grads():
    """The TPU primal now rides the interpolation-matmul kernel
    (_FORCE_PALLAS_FWD exercises that branch in interpret mode): values
    must match the gather formulation and the custom VJP must be
    unaffected (it saves (img, grid), not the primal)."""
    img, grid, cot = _case(seed=13)

    def loss(im, gr, pm, ac):
        return jnp.sum(grid_sample(im, gr, padding_mode=pm,
                                   align_corners=ac) * cot)

    ref = {}
    for pm, ac in MODES:
        ref[(pm, ac)] = (
            _gather_impl(img, grid, pm, ac),
            jax.grad(loss, argnums=(0, 1))(img, grid, pm, ac))

    old = gs_mod._FORCE_PALLAS_FWD
    gs_mod._FORCE_PALLAS_FWD = True
    jax.clear_caches()
    try:
        for pm, ac in MODES:
            val = grid_sample(img, grid, padding_mode=pm, align_corners=ac)
            gi, gg = jax.grad(loss, argnums=(0, 1))(img, grid, pm, ac)
            np.testing.assert_allclose(np.asarray(val),
                                       np.asarray(ref[(pm, ac)][0]),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(gi),
                                       np.asarray(ref[(pm, ac)][1][0]),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(gg),
                                       np.asarray(ref[(pm, ac)][1][1]),
                                       rtol=1e-4, atol=1e-5)
    finally:
        gs_mod._FORCE_PALLAS_FWD = old
        jax.clear_caches()
