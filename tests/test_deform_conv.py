"""DCNv2 op (ops/deform_conv.py) vs XLA conv oracles.

With zero offsets and unit mask, DCNv2 must equal a regular 3x3 conv with
zero padding (the mmcv kernel's degenerate case); integer offsets must
equal the conv over a shifted image. Backbone wiring
(ResNetDet50 stage_with_dcn) is smoke-checked at tiny dims.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tps_pp_tpu.ops.deform_conv import ModulatedDeformConv, deform_conv2d


def _conv3x3(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@pytest.mark.parametrize('stride', [1, 2])
def test_zero_offset_matches_conv(stride):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)) * 0.1, jnp.float32)
    Ho = (9 + 2 * 1 - 3) // stride + 1
    Wo = (11 + 2 * 1 - 3) // stride + 1
    offset = jnp.zeros((2, Ho, Wo, 18), jnp.float32)
    mask = jnp.ones((2, Ho, Wo, 9), jnp.float32)
    got = deform_conv2d(x, offset, mask, w, stride=stride)
    ref = _conv3x3(x, w, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_integer_offset_shifts_sampling():
    """Every tap shifted by (0, +1) equals the conv over the x-shifted
    (zero-padded) image."""
    rng = np.random.default_rng(1)
    x = np.asarray(rng.standard_normal((1, 8, 8, 3)), np.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5)) * 0.1, jnp.float32)
    offset = np.zeros((1, 8, 8, 9, 2), np.float32)
    offset[..., 1] = 1.0   # dx = +1 for all taps
    mask = jnp.ones((1, 8, 8, 9), jnp.float32)
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(
        offset.reshape(1, 8, 8, 18)), mask, w)
    shifted = np.zeros_like(x)
    shifted[:, :, :-1] = x[:, :, 1:]   # sample at x+1 == shift image left
    ref = _conv3x3(jnp.asarray(shifted), w)
    # interior columns only: at j=0 the DCN tap (kw=0, dx=+1) lands
    # in-bounds on x[0] while the shifted-image conv reads padding
    np.testing.assert_allclose(np.asarray(got)[:, :, 1:],
                               np.asarray(ref)[:, :, 1:],
                               atol=1e-5, rtol=1e-5)


def test_layer_init_is_half_conv():
    """mmcv zero-inits the offset/mask conv: at init DCNv2 == 0.5 * regular
    conv (sigmoid(0) modulation)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 6, 7, 4)), jnp.float32)
    layer = ModulatedDeformConv(5)
    v = layer.init(jax.random.PRNGKey(0), x)
    got = layer.apply(v, x)
    ref = 0.5 * _conv3x3(x, v['params']['kernel'])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_resnet50_dcn_stages():
    from tps_pp_tpu.models.textdet.pan import ResNetDet50

    bb = ResNetDet50(stage_blocks=(1, 1, 1, 1), base_channels=8,
                     stage_with_dcn=(False, True, True, True),
                     dcn=dict(type='DCNv2', deform_groups=1))
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), x)
    outs = bb.apply(v, x)
    assert [o.shape[-1] for o in outs] == [32, 64, 128, 256]
    # dcn stages carry the offset-predicting conv; stage 1 does not
    assert 'conv_offset' in v['params']['layer2_block0']['conv2']
    assert 'conv_offset' not in v['params']['layer1_block0']
    # gradients flow through the sampler
    def loss(p):
        return bb.apply({'params': p,
                         'batch_stats': v['batch_stats']}, x)[-1].sum()
    g = jax.grad(loss)(v['params'])
    gn = np.asarray(jnp.linalg.norm(
        g['layer2_block0']['conv2']['kernel'].astype(jnp.float32)))
    assert np.isfinite(gn)
