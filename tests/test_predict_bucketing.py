"""predict()'s power-of-two batch bucketing: identical results, bounded
jit cache (serving would otherwise recompile per distinct crop count)."""
import numpy as np

import jax
import jax.numpy as jnp

import tps_pp_tpu.models  # noqa: F401
import tps_pp_tpu.losses  # noqa: F401
from tps_pp_tpu.apis.recognizer import build_recognizer


def _tiny_crnn_cfg():
    return dict(
        type='CRNNNet',
        label_convertor=dict(type='CTCConvertor', dict_type='DICT36',
                             with_unknown=False, lower=True),
        backbone=dict(type='VeryDeepVgg', leaky_relu=False,
                      input_channels=1),
        decoder=dict(type='CRNNDecoder', in_channels=512, rnn_flag=False),
        loss=dict(type='CTCLoss'),
        max_seq_len=10,
    )


def test_bucketing_matches_and_bounds_compiles():
    rec = build_recognizer(_tiny_crnn_cfg())
    variables = rec.init_variables(jax.random.PRNGKey(0), (1, 32, 64, 1))
    rng = np.random.default_rng(0)
    img7 = jnp.asarray(rng.standard_normal((7, 32, 64, 1)), jnp.float32)

    out7 = np.asarray(rec.predict(variables, img7))
    ref7 = np.asarray(rec.predict(variables, img7, bucket_batch=False))
    assert out7.shape[0] == 7
    np.testing.assert_allclose(out7, ref7, atol=1e-5, rtol=1e-5)

    # all of N in 5..8 share the N=8 program: exactly one compiled entry
    # (plus one for the unbucketed N=7 call above)
    sizes_before = rec._predict_jit._cache_size()
    for n in (5, 6):
        out = rec.predict(variables, img7[:n])
        assert out.shape[0] == n
        np.testing.assert_allclose(np.asarray(out), ref7[:n],
                                   atol=1e-5, rtol=1e-5)
    assert rec._predict_jit._cache_size() == sizes_before

    # power-of-two batches pass through unpadded
    out4 = rec.predict(variables, img7[:4])
    assert out4.shape[0] == 4
    np.testing.assert_allclose(np.asarray(out4), ref7[:4],
                               atol=1e-5, rtol=1e-5)

    # a plain-list valid_ratio must survive the padding path
    outl = rec.predict(variables, img7[:3], [1.0, 1.0, 1.0])
    assert outl.shape[0] == 3
    np.testing.assert_allclose(np.asarray(outl), ref7[:3],
                               atol=1e-5, rtol=1e-5)
