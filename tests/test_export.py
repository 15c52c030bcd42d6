"""Deployment path: AOT compile + serialized export round-trip
(reference analog: tools/deployment pytorch2onnx -> deploy_test)."""
import pytest

pytestmark = pytest.mark.heavy
import jax
import jax.numpy as jnp
import numpy as np

import tps_pp_tpu.models  # noqa: F401
import tps_pp_tpu.losses  # noqa: F401
from tps_pp_tpu.apis.recognizer import build_recognizer
from tps_pp_tpu.utils.export import (ExportedRecognizer, aot_compile,
                                     export_serialized, load_serialized)


def _tiny():
    cfg = dict(
        type='CRNNNet',
        label_convertor=dict(type='CTCConvertor', dict_type='DICT36',
                             with_unknown=False, lower=True),
        backbone=dict(type='VeryDeepVgg', leaky_relu=False,
                      input_channels=1),
        decoder=dict(type='CRNNDecoder', in_channels=512, rnn_flag=False),
        loss=dict(type='CTCLoss'),
        max_seq_len=8,
    )
    rec = build_recognizer(cfg)
    variables = rec.init_variables(jax.random.PRNGKey(0), (2, 32, 100, 1))
    return rec, variables


def test_aot_compile_and_exported_recognizer():
    rec, variables = _tiny()
    img = np.random.default_rng(0).standard_normal(
        (2, 32, 100, 1)).astype(np.float32)
    expect = rec.simple_test(variables, jnp.asarray(img))

    exported = ExportedRecognizer(rec, variables, batch=4,
                                  input_shape=(32, 100, 1))
    got = exported.simple_test(img)
    assert [r['text'] for r in got] == [r['text'] for r in expect]


def test_serialized_export_roundtrip():
    rec, variables = _tiny()
    blob = export_serialized(rec, variables, batch=2,
                             input_shape=(32, 100, 1))
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000
    fn = load_serialized(bytes(blob))
    img = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 32, 100, 1)), jnp.float32)
    out = fn.call(img, jnp.ones((2,), jnp.float32))
    ref = rec.predict(variables, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
