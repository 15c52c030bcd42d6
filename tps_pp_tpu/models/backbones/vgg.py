"""VeryDeepVgg — CRNN backbone (reference ``backbones/very_deep_vgg.py``).

7 convs with LeakyReLU(0.2), BN on convs 2/4/6, asymmetric maxpools taking
(N,H,W,C) -> (N,1,W/4+1,512) for 32-high inputs. Matches the reference layer
list exactly (very_deep_vgg.py:27-64).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..layers import max_pool


@BACKBONES.register_module()
class VeryDeepVgg(nn.Module):
    leaky_relu: bool = True
    input_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = [3, 3, 3, 3, 3, 3, 2]
        ps = [1, 1, 1, 1, 1, 1, 0]
        nm = [64, 128, 256, 256, 512, 512, 512]
        bn = [False, False, True, False, True, False, True]

        def act(v):
            return nn.leaky_relu(v, 0.2) if self.leaky_relu else nn.relu(v)

        def conv(i, v):
            v = nn.Conv(nm[i], (ks[i], ks[i]),
                        padding=((ps[i], ps[i]), (ps[i], ps[i])),
                        dtype=self.dtype, name=f'conv{i}')(v)
            if bn[i]:
                v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f'batchnorm{i}')(v)
            return act(v)

        x = conv(0, x)
        x = max_pool(x, 2, 2)                    # H/2
        x = conv(1, x)
        x = max_pool(x, 2, 2)                    # H/4
        x = conv(2, x)
        x = conv(3, x)
        x = max_pool(x, (2, 2), (2, 1), (0, 1))  # H/8, W/4+1
        x = conv(4, x)
        x = conv(5, x)
        x = max_pool(x, (2, 2), (2, 1), (0, 1))  # H/16
        x = conv(6, x)                           # H/32 (2x2 valid conv)
        return x
