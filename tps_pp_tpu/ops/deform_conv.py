"""Modulated deformable convolution (DCNv2) — TPU-native.

The reference's dbnet_r50dcnv2 / fcenet_r50dcnv2 configs use mmcv's CUDA
``ModulatedDeformConv2dPack`` (``dcn=dict(type='DCNv2')`` in
configs/_base_/det_models/dbnet_r50dcnv2_fpnc.py). A scatter/gather CUDA
kernel maps poorly to the MXU, so the TPU decomposition here is:

  1. 9 bilinear gathers — one per 3x3 tap, each a full-image sample at
     (base tap position + learned offset), modulated by the learned mask
     (sigmoid), producing (N, Ho, Wo, 9*Cin);
  2. ONE matmul of that against the (9*Cin, Cout)-reshaped kernel — all
     the FLOPs land on the systolic array in a single contraction instead
     of 9 small convs.

Semantics follow mmcv (mmcv/ops/modulated_deform_conv.py): zero padding
outside the image, offset channels ordered (dy, dx) per tap, taps
row-major; the offset/mask-predicting conv is zero-initialized so the op
starts as 0.5x a regular conv (mask = sigmoid(0)).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bilinear_zeros(img, gy, gx):
    """Bilinear sample img (N,H,W,C) at pixel coords gy/gx (N,Ho,Wo) with
    zero padding outside [0,H-1]x[0,W-1]."""
    N, H, W, C = img.shape
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    wy = (gy - y0)[..., None]
    wx = (gx - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))[..., None]
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        v = jnp.take_along_axis(
            img.reshape(N, H * W, C),
            (yc * W + xc).reshape(N, -1, 1), axis=1
        ).reshape(yi.shape + (C,))
        return jnp.where(valid, v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def deform_conv2d(x, offset, mask, weight, bias=None, stride: int = 1):
    """DCNv2 forward. x (N,H,W,Cin); offset (N,Ho,Wo,18) as (dy,dx) per
    row-major 3x3 tap; mask (N,Ho,Wo,9) already sigmoided; weight
    (3,3,Cin,Cout) (HWIO). 3x3, padding=1, dilation=1."""
    N, H, W, Cin = x.shape
    Ho, Wo = offset.shape[1], offset.shape[2]
    f32 = jnp.float32
    base_y = (jnp.arange(Ho, dtype=f32) * stride)[None, :, None]
    base_x = (jnp.arange(Wo, dtype=f32) * stride)[None, None, :]
    off = offset.astype(f32).reshape(N, Ho, Wo, 9, 2)
    cols = []
    for k in range(9):
        kh, kw = divmod(k, 3)
        gy = base_y + (kh - 1) + off[..., k, 0]
        gx = base_x + (kw - 1) + off[..., k, 1]
        s = _bilinear_zeros(x.astype(f32), gy, gx)
        cols.append(s * mask[..., k:k + 1].astype(f32))
    col = jnp.concatenate(cols, axis=-1)                    # (N,Ho,Wo,9*Cin)
    w = weight.astype(f32).reshape(9 * Cin, -1)             # one MXU matmul
    out = col.reshape(N, Ho * Wo, 9 * Cin) @ w
    out = out.reshape(N, Ho, Wo, -1).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


class ModulatedDeformConv(nn.Module):
    """DCNv2 layer: a zero-initialized regular conv predicts 27 channels
    (18 offsets + 9 mask logits), then :func:`deform_conv2d` applies the
    deformable 3x3 (mmcv ModulatedDeformConv2dPack equivalent)."""
    features: int
    stride: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        om = nn.Conv(27, (3, 3), strides=(self.stride, self.stride),
                     padding=((1, 1), (1, 1)),
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name='conv_offset')(x)
        offset, mask_logit = om[..., :18], om[..., 18:]
        mask = jax.nn.sigmoid(mask_logit.astype(jnp.float32))
        weight = self.param(
            'kernel', nn.initializers.he_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        return deform_conv2d(x, offset, mask, weight, bias,
                             stride=self.stride)
