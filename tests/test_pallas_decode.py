"""Fused decode-step kernels vs the unfused XLA path (interpret mode on
CPU; compiled on TPU via bench.py / the flagship config)."""
import pytest

pytestmark = pytest.mark.heavy
import functools

import jax
import jax.numpy as jnp
import numpy as np

import tps_pp_tpu.models  # noqa: F401
import tps_pp_tpu.losses  # noqa: F401
from tps_pp_tpu.apis.recognizer import build_recognizer
from tps_pp_tpu.models.decoders.base import greedy_decode


def _interp(fn):
    return functools.partial(fn, interpret=True)


def test_fused_step_matches_unfused(monkeypatch):
    import tps_pp_tpu.ops.pallas_decode as pd
    monkeypatch.setattr(pd, 'self_attn_step', _interp(pd.self_attn_step))
    monkeypatch.setattr(pd, 'cross_ffn_step', _interp(pd.cross_ffn_step))

    def cfg(fused):
        return dict(
            type='NRTR',
            label_convertor=dict(type='AttnConvertor', dict_type='DICT36',
                                 with_unknown=True),
            backbone=dict(type='ResNetABI_v2_large', in_channels=3,
                          stem_channels=4, base_channels=4,
                          arch_settings=[1, 1, 1, 1, 1],
                          strides=[1, 2, 2, 1, 2]),
            encoder=dict(type='NRTREncoder', n_layers=1, n_head=2, d_k=8,
                         d_v=8, d_model=64, d_inner=64, dropout=0.0),
            decoder=dict(type='NRTRDecoder', n_layers=2, d_embedding=64,
                         n_head=2, d_model=64, d_inner=64, d_k=8, d_v=8,
                         dropout=0.0, use_fused_step=fused),
            loss=dict(type='TFLoss'),
            max_seq_len=6,
        )

    rec_f = build_recognizer(cfg(True))
    rec_u = build_recognizer(cfg(False))
    variables = rec_u.init_variables(jax.random.PRNGKey(0), (2, 16, 64, 3))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 16, 64, 3)), jnp.float32)
    vr = jnp.asarray([1.0, 0.6], jnp.float32)

    def decode(rec):
        feat, out_enc = rec.module.apply(variables, img, vr,
                                         method='encode_full')
        return np.asarray(greedy_decode(
            lambda m, *a: rec.module.apply(variables, *a, method=m),
            feat, out_enc, vr, max_seq_len=6,
            start_idx=rec.label_convertor.start_idx))

    out_u = decode(rec_u)
    out_f = decode(rec_f)
    np.testing.assert_array_equal(out_u.argmax(-1), out_f.argmax(-1))
    np.testing.assert_allclose(out_f, out_u, rtol=5e-2, atol=2e-3)
