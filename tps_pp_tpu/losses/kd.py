"""Feature distillation loss — cosine + POD-spatial (reference
``losses/kd_loss.py:5-83``; the fork wires it into training but ships it
commented out, encode_decode_recognizer.py:124-129/178-181).

``kd_loss(teacher, student)``: cosine-embedding distance between flattened
features plus the v2 POD spatial term (channel-summed squared energy maps,
L2-normalized, mean Frobenius distance). NHWC inputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import LOSSES

LAMBDA_F = 1.0
LAMBDA_C = 1.0


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def pod_spatial_loss_v2(teacher, student, normalize: bool = True):
    """teacher/student: (N, H, W, C)."""
    a = jnp.square(teacher).sum(axis=-1).reshape(teacher.shape[0], -1)
    b = jnp.square(student).sum(axis=-1).reshape(student.shape[0], -1)
    if normalize:
        a = _l2_normalize(a)
        b = _l2_normalize(b)
    return jnp.mean(jnp.linalg.norm(a - b, axis=-1))


def kd_loss(teacher_features, student_features):
    """Returns the scalar distillation loss (teacher is stop-gradiented)."""
    t = jax.lax.stop_gradient(teacher_features.astype(jnp.float32))
    s = student_features.astype(jnp.float32)
    B = s.shape[0]
    tf = _l2_normalize(t.reshape(B, -1))
    sf = _l2_normalize(s.reshape(B, -1))
    cos = 1.0 - jnp.sum(tf * sf, axis=-1)          # cosine embedding, y=1
    flat = jnp.mean(cos) * LAMBDA_F
    spatial = pod_spatial_loss_v2(t, s) * LAMBDA_C
    return flat + spatial


@LOSSES.register_module()
class KD_Loss:
    def __call__(self, teacher_features, student_features):
        return {'loss_kd': kd_loss(teacher_features, student_features)}
