"""grid_sample parity vs torch F.grid_sample (the native kernel the
reference relies on at tps_pp.py:606-615 / tps_preprocessor.py:79-83)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tps_pp_tpu.ops.grid_sample import grid_sample, grid_sample_onehot


def _rand_case(rng, N=2, H=8, W=12, C=3, Ho=5, Wo=7, lo=-1.3, hi=1.3):
    img = rng.standard_normal((N, H, W, C)).astype(np.float32)
    grid = rng.uniform(lo, hi, size=(N, Ho, Wo, 2)).astype(np.float32)
    return img, grid


@pytest.mark.parametrize('padding_mode', ['border', 'zeros'])
@pytest.mark.parametrize('align_corners', [True, False])
def test_matches_torch(padding_mode, align_corners):
    rng = np.random.default_rng(0)
    img, grid = _rand_case(rng)
    out = np.asarray(grid_sample(img, grid, padding_mode=padding_mode,
                                 align_corners=align_corners))
    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid), mode='bilinear',
        padding_mode=padding_mode,
        align_corners=align_corners).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_zero_one_grid_quirk():
    """TPS++ feeds [0,1] grids to a [-1,1] sampler (reference
    tps_pp.py:606-615) — both samplers must agree with torch on that range."""
    rng = np.random.default_rng(1)
    img, _ = _rand_case(rng)
    grid = rng.uniform(0.0, 1.0, size=(2, 5, 7, 2)).astype(np.float32)
    out = np.asarray(grid_sample(img, grid, 'border', True))
    ref = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                        torch.from_numpy(grid), mode='bilinear',
                        padding_mode='border',
                        align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_onehot_matches_gather():
    rng = np.random.default_rng(2)
    img, grid = _rand_case(rng)
    flat = grid.reshape(2, -1, 2)
    a = np.asarray(grid_sample_onehot(img, flat))
    b = np.asarray(grid_sample(img, grid, 'border', True)).reshape(2, -1, 3)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
