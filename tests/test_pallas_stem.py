"""Fused (C, P)-layout stem kernels vs the flax backbone (eval mode).

The channels-on-sublanes stem (ops/pallas_stem.py) must reproduce
``ResNetABIBase.stem_and_head`` exactly at f32 — same convs, BN folded,
same skips — for the flagship v2_large geometry (reference
resnet_v2_large.py:163-196)."""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

import jax
import jax.numpy as jnp

from tps_pp_tpu.models.backbones.resnet_abi import ResNetABI_v2_large
from tps_pp_tpu.ops.pallas_stem import (basic_block_cp, conv3x3_cp,
                                        cp_to_nhwc, fused_stem_forward,
                                        hwio_to_taps, nhwc_to_cp)


def test_conv3x3_cp_matches_lax_conv():
    rng = np.random.default_rng(0)
    N, H, W, C = 4, 8, 128, 32
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
    out = cp_to_nhwc(conv3x3_cp(nhwc_to_cp(x), hwio_to_taps(w), b[:, None],
                                H=H, W=W, bn=2, interpret=True), (N, H, W))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_basic_block_cp_matches_flax_block():
    from tps_pp_tpu.models.layers import BasicBlock
    rng = np.random.default_rng(1)
    N, H, W, C = 2, 8, 64, 32
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
    blk = BasicBlock(C, use_conv1x1=True)
    v = blk.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats + affines so a fold_bn bug can't hide behind
    # mean=0 / var=1 / gamma=1 / beta=0 defaults
    keys = iter(jax.random.split(jax.random.PRNGKey(7), 64))

    def perturb(path, a):
        name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        if name in ('mean', 'bias'):
            return a + jax.random.normal(next(keys), a.shape) * 0.3
        if name in ('var', 'scale'):
            return a * jnp.exp(jax.random.normal(next(keys), a.shape) * 0.3)
        return a
    v = jax.tree_util.tree_map_with_path(perturb, v)
    ref = blk.apply(v, x, train=False)

    from tps_pp_tpu.ops.pallas_stem import fold_bn
    p, s = v['params'], v['batch_stats']
    w1, b1 = fold_bn(p['conv1']['kernel'][0, 0], p['bn1'], s['bn1'])
    w2, b2 = fold_bn(p['conv2']['kernel'], p['bn2'], s['bn2'])
    out2d = basic_block_cp(nhwc_to_cp(x), w1.T, b1[:, None],
                           hwio_to_taps(w2), b2[:, None],
                           H=H, W=W, residual=True, bn=1, interpret=True)
    out = cp_to_nhwc(out2d, (N, H, W))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_fused_stem_matches_flax_stem():
    rng = np.random.default_rng(2)
    N, H, W = 2, 32, 128
    bb = ResNetABI_v2_large(in_channels=3, stem_channels=32,
                            base_channels=32,
                            arch_settings=[3, 4, 6, 6, 3],
                            strides=[1, 2, 2, 1, 2])
    img = jnp.asarray(rng.standard_normal((N, H, W, 3)), jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), img)
    ref_x, ref_skips = bb.apply(v, img, train=False,
                                method=bb.stem_and_head)
    x, skips = fused_stem_forward(v['params'], v['batch_stats'], img,
                                  dtype=jnp.float32, interpret=True)
    assert x.shape == ref_x.shape
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref_x),
                               atol=1e-3, rtol=1e-3)
    assert len(skips) == len(ref_skips)
    for a, b in zip(skips, ref_skips):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_predict_with_fused_stem_matches_xla_stem(monkeypatch):
    """End-to-end: the tiny flagship's predict with stem_mode='fused'
    (interpret) must match stem_mode='xla' scores."""
    import tps_pp_tpu.ops.pallas_stem as ps
    orig = ps.fused_stem_forward
    monkeypatch.setattr(
        ps, 'fused_stem_forward',
        lambda *a, **k: orig(*a, **{**k, 'interpret': True}))

    from tps_pp_tpu.apis.flagship import nrtr_tps_pp_cfg
    from tps_pp_tpu.apis.recognizer import build_recognizer
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((2, 32, 64, 3)), jnp.float32)
    scores = {}
    for mode in ('xla', 'fused'):
        cfg = nrtr_tps_pp_cfg(tiny=True)
        cfg['stem_mode'] = mode
        rec = build_recognizer(cfg)
        assert rec.resolved_stem_mode() == mode
        variables = rec.init_variables(jax.random.PRNGKey(0), (2, 32, 64, 3))
        scores[mode] = np.asarray(rec.predict(variables, img), np.float32)
    np.testing.assert_allclose(scores['fused'], scores['xla'],
                               atol=2e-3, rtol=1e-3)
