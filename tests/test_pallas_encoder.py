"""Whole-encoder pallas kernel vs the XLA TFEncoderLayer stack."""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

import jax
import jax.numpy as jnp

from tps_pp_tpu.models.encoders.nrtr import NRTREncoder


def test_fused_encoder_matches_xla(monkeypatch):
    import tps_pp_tpu.ops.pallas_encoder as pe
    orig = pe.fused_encoder_forward

    def interp(*args, **kwargs):
        kwargs['interpret'] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pe, 'fused_encoder_forward', interp)

    rng = np.random.default_rng(0)
    enc = NRTREncoder(n_layers=2, n_head=4, d_k=16, d_v=16, d_model=64,
                      d_inner=128, dtype=jnp.float32)
    feat = jnp.asarray(rng.standard_normal((6, 4, 8, 64)), jnp.float32)
    vr = jnp.asarray([0.4, 1.0, 0.7, 1.0, 0.55, 0.9], jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), feat, valid_ratio=vr)

    ref = np.asarray(enc.apply(v, feat, valid_ratio=vr))
    got = np.asarray(enc.apply(v, feat, valid_ratio=vr, fused=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    # batch not divisible by the block size exercises the divisor fallback
    feat3 = feat[:3]
    ref3 = np.asarray(enc.apply(v, feat3, valid_ratio=vr[:3]))
    got3 = np.asarray(enc.apply(v, feat3, valid_ratio=vr[:3], fused=True))
    np.testing.assert_allclose(got3, ref3, atol=2e-5, rtol=1e-4)

    # no-mask path
    ref_nm = np.asarray(enc.apply(v, feat))
    got_nm = np.asarray(enc.apply(v, feat, fused=True))
    np.testing.assert_allclose(got_nm, ref_nm, atol=2e-5, rtol=1e-4)

    # odd and singleton batches: must route through the masked-padding
    # path (bi=1 trips an MLIR lowering bug on TPU, so the kernel pads to
    # bi=2 and slices) rather than a bi=1 grid
    for n in (5, 1):
        featn, vrn = feat[:n], vr[:n]
        refn = np.asarray(enc.apply(v, featn, valid_ratio=vrn))
        gotn = np.asarray(enc.apply(v, featn, valid_ratio=vrn, fused=True))
        assert gotn.shape == refn.shape
        np.testing.assert_allclose(gotn, refn, atol=2e-5, rtol=1e-4)
        # no-mask variant of the same shapes
        refn = np.asarray(enc.apply(v, featn))
        gotn = np.asarray(enc.apply(v, featn, fused=True))
        np.testing.assert_allclose(gotn, refn, atol=2e-5, rtol=1e-4)
