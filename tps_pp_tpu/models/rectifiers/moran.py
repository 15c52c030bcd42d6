"""MORAN — MORN offset-based rectifier (reference
``preprocessor/moran.py:15-131``).

A small conv net predicts a 1-channel offset field from a bilinearly
downsized input; positive/negative branches are max-pooled (kernel 2,
stride 1), resampled onto the target grid, and added to the base grid's y
coordinates; the input is then warped by that grid. ``enhance`` extra
iterations refine the offsets (reference moran.py:94-103). NHWC.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.grid_sample import grid_sample
from ...registry import PREPROCESSOR
from ..layers import max_pool


def _identity_grid(h: int, w: int) -> np.ndarray:
    """(h, w, 2) grid spanning [-1,1] with align_corners semantics."""
    gx = np.linspace(-1.0, 1.0, w)
    gy = np.linspace(-1.0, 1.0, h)
    return np.stack(np.meshgrid(gx, gy), axis=-1).astype(np.float32)


def _resize_bilinear_ac(x, h: int, w: int):
    """Bilinear resize with align_corners=True (torch interpolate semantics),
    expressed through the border grid_sample."""
    grid = jnp.asarray(_identity_grid(h, w))[None]
    grid = jnp.broadcast_to(grid, (x.shape[0], h, w, 2))
    return grid_sample(x, grid, padding_mode='border', align_corners=True)


@PREPROCESSOR.register_module()
class MORAN(nn.Module):
    num_img_channel: int = 3
    img_size: Tuple[int, int] = (32, 128)
    enhance: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = self.img_size
        base = jnp.asarray(_identity_grid(H, W))[None]
        base = jnp.broadcast_to(base, (x.shape[0], H, W, 2))

        # declare the offset-net layers ONCE and call the same instances in
        # every refinement iteration: the reference reuses self.cnn across
        # enhance iterations (weight sharing, moran.py:94-103), and
        # re-declaring name='conv0' per call raises flax NameInUseError
        convs = [nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name=f'conv{i}')
                 for i, ch in enumerate([64, 128, 64, 16, 1])]
        bns = [nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name=f'bn{i}')
               for i in range(5)]

        def offset_net(v):
            v = max_pool(v, 2, 2)
            for i, (conv, bn) in enumerate(zip(convs, bns)):
                v = bn(conv(v))
                if i < 4:
                    v = nn.relu(v)
                if i in (0, 1):
                    v = max_pool(v, 2, 2)
            return v

        x_small = _resize_bilinear_ac(x, H, W)

        def offsets_from(v):
            o = offset_net(v)
            o_pool = (max_pool(nn.relu(o), 2, 1) -
                      max_pool(nn.relu(-o), 2, 1))
            return grid_sample(o_pool, base, 'border', True)  # (N,H,W,1)

        offsets_grid = offsets_from(x_small)
        grid = jnp.concatenate(
            [base[..., :1], base[..., 1:] + offsets_grid], axis=-1)
        x_rect = grid_sample(x, grid, 'border', True)
        for _ in range(self.enhance):
            offsets_grid = offsets_grid + offsets_from(x_rect)
            grid = jnp.concatenate(
                [base[..., :1], base[..., 1:] + offsets_grid], axis=-1)
            x_rect = grid_sample(x, grid, 'border', True)
        return x_rect
