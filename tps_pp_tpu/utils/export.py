"""Model export / AOT compilation — the TPU counterpart of the reference's
deployment stack (SURVEY §5.9: pytorch2onnx -> onnx2tensorrt ->
deploy_test with ONNXRuntime/TensorRT recognizer subclasses).

On TPU the natural analog is:
  * ``export_serialized`` — jax.export a jitted inference fn to a portable
    StableHLO artifact (+ loading back), replacing the .onnx interchange.
  * ``aot_compile`` — ahead-of-time lower+compile for a fixed input shape,
    replacing the TensorRT engine build; returns an executable with
    compile-free first-call latency.
  * ``ExportedRecognizer`` — drop-in object exposing the same
    ``simple_test`` surface as TextRecognizer, mirroring how the reference
    wraps engines in recognizer subclasses (deploy_utils.py:113,259).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _infer_fn(rec, variables):
    def fn(img, valid_ratio):
        return rec._predict_impl(variables, img, valid_ratio)
    return fn


def aot_compile(rec, variables, batch: int, input_shape: Tuple[int, int, int],
                dtype=jnp.float32):
    """AOT-compile the full inference path for a fixed batch shape."""
    h, w, c = input_shape
    fn = jax.jit(_infer_fn(rec, variables))
    lowered = fn.lower(jnp.zeros((batch, h, w, c), dtype),
                       jnp.ones((batch,), jnp.float32))
    return lowered.compile()


def export_serialized(rec, variables, batch: int,
                      input_shape: Tuple[int, int, int],
                      dtype=jnp.float32) -> bytes:
    """Serialize the jitted inference fn to portable bytes (StableHLO)."""
    from jax import export as jexport
    h, w, c = input_shape
    fn = jax.jit(_infer_fn(rec, variables))
    exported = jexport.export(fn)(
        jax.ShapeDtypeStruct((batch, h, w, c), dtype),
        jax.ShapeDtypeStruct((batch,), jnp.float32))
    return exported.serialize()


def load_serialized(blob: bytes):
    from jax import export as jexport
    return jexport.deserialize(blob)


class ExportedRecognizer:
    """simple_test-compatible wrapper over an AOT-compiled executable."""

    def __init__(self, rec, variables, batch: int,
                 input_shape: Tuple[int, int, int], dtype=jnp.float32):
        self.label_convertor = rec.label_convertor
        self.batch = batch
        self._exec = aot_compile(rec, variables, batch, input_shape, dtype)
        self._dtype = dtype

    def simple_test(self, img, valid_ratio=None, img_metas=None):
        n = img.shape[0]
        assert n <= self.batch, f'batch {n} > compiled batch {self.batch}'
        if n < self.batch:  # pad to the compiled shape
            pad = np.repeat(img[-1:], self.batch - n, axis=0)
            img = np.concatenate([img, pad], axis=0)
        vr = np.ones((self.batch,), np.float32)
        if valid_ratio is not None:
            vr[:n] = np.asarray(valid_ratio)
        out = np.asarray(self._exec(jnp.asarray(img, self._dtype),
                                    jnp.asarray(vr)))[:n]
        metas = img_metas or [{'valid_ratio': float(r)} for r in vr[:n]]
        idxs, scores = self.label_convertor.tensor2idx(out, metas)
        strings = self.label_convertor.idx2str(idxs)
        return [dict(text=s, score=sc) for s, sc in zip(strings, scores)]
