"""Classic RARE TPS-STN image-space preprocessor.

Re-implements reference ``preprocessor/tps_preprocessor.py:25-282``:
LocalizationNetwork conv stack (4x conv-BN-ReLU-pool + adaptive avg pool)
predicting 2K fiducials with zero-init fc2 + border-point bias in [-1,1]
(tps_preprocessor.py:126-139), then classic (un-modulated) TPS grid
generation (static inv_delta_C/P_hat buffers, :179-188) and border-padded
align_corners grid_sample. Unlike TPS++, RARE's coordinates really are in
[-1,1] (SURVEY §2.4). NHWC.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import tps as tps_ops
from ...ops.grid_sample import grid_sample
from ...registry import PREPROCESSOR
from ..layers import max_pool


class LocalizationNetwork(nn.Module):
    num_fiducial: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate([64, 128, 256, 512]):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f'conv{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'bn{i}')(x)
            x = nn.relu(x)
            if i < 3:
                x = max_pool(x, 2, 2)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        x = nn.Dense(256, dtype=self.dtype, name='fc1')(x)
        x = nn.relu(x)
        # zero weights + border-fiducial bias (tps_preprocessor.py:130-139)
        half = self.num_fiducial // 2
        cx = np.linspace(-1.0, 1.0, half)
        top = np.stack([cx, np.linspace(0.0, -1.0, half)], axis=1)
        bot = np.stack([cx, np.linspace(1.0, 0.0, half)], axis=1)
        bias = np.concatenate([top, bot], axis=0).reshape(-1).astype(
            np.float32)
        x = nn.Dense(self.num_fiducial * 2, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     bias_init=lambda *a: jnp.asarray(bias), name='fc2')(x)
        return x.reshape(-1, self.num_fiducial, 2)


@PREPROCESSOR.register_module()
class TPSPreprocessor(nn.Module):
    num_fiducial: int = 20
    img_size: Tuple[int, int] = (32, 100)
    rectified_img_size: Tuple[int, int] = (32, 100)
    num_img_channel: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        self.localization = LocalizationNetwork(self.num_fiducial,
                                                dtype=self.dtype)
        C = tps_ops.build_C_border(self.num_fiducial)
        self.inv_delta_C = jnp.asarray(tps_ops.build_inv_delta_C(C),
                                       jnp.float32)
        P = tps_ops.build_P_minus1_1(self.rectified_img_size[1],
                                     self.rectified_img_size[0])
        P_hat = tps_ops.build_P_hat(C, P, eps=1e-6)
        # static [1 | P | P_hat] (n, F+3) (tps_preprocessor.py:267)
        self.P_hat_full = jnp.asarray(
            np.concatenate([np.ones((P.shape[0], 1)), P, P_hat], axis=1),
            jnp.float32)

    def __call__(self, batch_img, train: bool = False):
        Cp = self.localization(batch_img, train=train).astype(jnp.float32)
        P_prime = tps_ops.build_P_prime_plain(Cp, self.inv_delta_C,
                                              self.P_hat_full)
        Hr, Wr = self.rectified_img_size
        grid = P_prime.reshape(-1, Hr, Wr, 2)
        return grid_sample(batch_img, grid, padding_mode='border',
                           align_corners=True)


@PREPROCESSOR.register_module()
class BasePreprocessor(nn.Module):
    """No-op preprocessor (reference base_preprocessor.py:1-12)."""
    dtype: Any = jnp.float32

    def __call__(self, batch_img, train: bool = False):
        return batch_img
