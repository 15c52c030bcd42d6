"""SPIN — Structure-Preserving Inner offset rectifier (AAAI-2021), operating
in color/intensity space (reference ``preprocessor/spin.py:42-395``).

SPN: per-image weights over a bank of gamma powers (generate_beta exponents,
spin.py:42-52) combine un-normalized pixel intensities; InstanceNorm +
sigmoid + re-normalize. AIN (``offsets=True``): a low-res additive offset
map blended via a learned gate. fc2 is zero-init with bias [0..0, 5, -5]
(spin.py:316-328) so training starts from a near-identity transform.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import PREPROCESSOR
from ..layers import max_pool
from .moran import _resize_bilinear_ac


def generate_beta(K: int):
    betas = []
    for i in range(1, K + 2):
        p = i / (2 * (K + 1))
        betas.append(round(float(np.log(1 - p) / np.log(p)), 2))
    for i in range(K + 2, 2 * K + 2):
        betas.append(round(1.0 / betas[i - (K + 1)], 2))
    return betas


def _instance_norm(x, eps: float = 1e-5):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


@PREPROCESSOR.register_module()
class SPIN(nn.Module):
    input_channel: int = 3
    offsets: bool = True
    default_type: int = 6
    img_norm_mean: Tuple[float, ...] = (0.485, 0.456, 0.406)
    img_norm_std: Tuple[float, ...] = (0.229, 0.224, 0.225)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        N = x.shape[0]
        powers = generate_beta(self.default_type)          # 2K+1 exponents
        n_w = len(powers) + (1 if self.offsets else 0)

        # --- feature trunk (spt_convnet, spin.py:196-237)
        v = x
        for i, ch in enumerate([32, 64, 128]):
            v = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f'spt_conv{i}')(v)
            v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'spt_bn{i}')(v)
            v = nn.relu(v)
            v = max_pool(v, 2, 2)
        feat = v                                           # (N, H/8, W/8, 128)

        # --- structure branch -> per-image weights (stucture_fc1/2)
        s = feat
        for i, ch in enumerate([256, 256, 512]):
            s = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f'fc1_conv{i}')(s)
            s = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'fc1_bn{i}')(s)
            s = nn.relu(s)
            if i < 2:
                s = max_pool(s, 2, 2)
        s = jnp.mean(s, axis=(1, 2))                       # adaptive avg pool
        s = nn.Dense(256, dtype=self.dtype, name='fc1_linear')(s)
        s = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='fc1_bn1d')(s)
        s = nn.relu(s)
        # fc2: zero weights, bias [0]*2K + [5] (+ [-5] for the AIN gate)
        bias_init = np.zeros((n_w,), np.float32)
        bias_init[len(powers) - 1] = 5.0
        if self.offsets:
            bias_init[-1] = -5.0
        wf = nn.Dense(n_w, dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      bias_init=lambda *a: jnp.asarray(bias_init),
                      name='fc2')(s)                       # (N, n_w)

        # --- AIN offsets (spin.py:272-283, 371-387)
        lambda_color, off = None, None
        if self.offsets:
            lambda_color = jax.nn.sigmoid(wf[:, -1])[:, None, None, None]
            sp_weight = wf[:, :-1]
            o = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name='offset_conv1')(feat)
            o = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name='offset_bn1')(o)
            o = nn.relu(o)
            o = nn.Conv(self.input_channel, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name='offset_conv2')(o)
            o = max_pool(o, 2, 2)
            o = jax.nn.sigmoid(o)
            off = _resize_bilinear_ac(o, x.shape[1], x.shape[2])
        else:
            sp_weight = wf

        # --- SPN color transform (SP_TransformerNetwork, spin.py:96-130)
        mean = jnp.asarray(self.img_norm_mean, x.dtype)
        std = jnp.asarray(self.img_norm_std, x.dtype)
        img = x * std + mean                                # un-normalize
        if off is not None:
            img = img * (1 - lambda_color) + off * lambda_color
        img = jnp.clip(img, 1e-6, 1.0)                      # pow stability
        power_stack = jnp.stack([img ** p for p in powers], axis=1)
        w = sp_weight[:, :, None, None, None]
        out = jnp.sum(power_stack * w, axis=1)
        out = _instance_norm(out)
        out = jax.nn.sigmoid(out)
        return (out - mean) / std
