"""Shared conv/recurrent building blocks (flax.linen, NHWC).

TPU-native counterparts of the reference's mmcv/torch layers:
  * ConvModule   — conv + optional BN + activation, matching mmcv ConvModule
    defaults (no norm => conv bias=True, ReLU activation) as used throughout
    reference ``tps_pp.py`` and the backbones.
  * BasicBlock   — resnet basic block incl. the ``use_conv1x1`` variant the
    reference uses for ABINet-style backbones (reference
    ``textrecog/layers/conv_layer.py:12-33``).
  * BidirectionalLSTM — CRNN's recurrent decoder layer (reference
    ``textrecog/layers/lstm_layer.py:5-21``), implemented as a
    ``jax.lax.scan`` over torch-gate-ordered LSTM cells so converted
    checkpoints drop in unchanged.

Layout convention: activations are NHWC (TPU conv layout); weights are HWIO.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class ConvModule(nn.Module):
    """Conv2D + optional BatchNorm + activation (mmcv ConvModule semantics)."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int], str] = 0
    use_norm: bool = False
    act: Optional[str] = 'relu'
    bias: Optional[bool] = None  # default: True iff no norm (mmcv behavior)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.bias if self.bias is not None else not self.use_norm
        k = _pair(self.kernel_size)
        if isinstance(self.padding, str):
            padding = self.padding
        else:
            p = _pair(self.padding)
            padding = ((p[0], p[0]), (p[1], p[1]))
        x = nn.Conv(self.out_channels, k, strides=_pair(self.stride),
                    padding=padding, use_bias=use_bias, dtype=self.dtype,
                    name='conv')(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        if self.act == 'relu':
            x = nn.relu(x)
        elif self.act == 'gelu':
            x = nn.gelu(x, approximate=False)
        elif self.act is not None:
            raise ValueError(self.act)
        return x


class BasicBlock(nn.Module):
    """ResNet basic block; ``use_conv1x1`` puts the stride on conv2
    (reference conv_layer.py:31-33)."""
    planes: int
    stride: Union[int, Tuple[int, int]] = 1
    use_conv1x1: bool = False
    use_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        if self.use_conv1x1:
            out = nn.Conv(self.planes, (1, 1), strides=(1, 1), padding='VALID',
                          use_bias=False, dtype=self.dtype, name='conv1')(x)
            out = nn.relu(norm('bn1')(out))
            out = nn.Conv(self.planes, (3, 3), strides=_pair(self.stride),
                          padding=((1, 1), (1, 1)), use_bias=False,
                          dtype=self.dtype, name='conv2')(out)
            out = norm('bn2')(out)
        else:
            out = nn.Conv(self.planes, (3, 3), strides=_pair(self.stride),
                          padding=((1, 1), (1, 1)), use_bias=False,
                          dtype=self.dtype, name='conv1')(x)
            out = nn.relu(norm('bn1')(out))
            out = nn.Conv(self.planes, (3, 3), strides=(1, 1),
                          padding=((1, 1), (1, 1)), use_bias=False,
                          dtype=self.dtype, name='conv2')(out)
            out = norm('bn2')(out)
        if self.use_downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=_pair(self.stride),
                               padding='VALID', use_bias=False,
                               dtype=self.dtype, name='downsample_conv')(x)
            identity = norm('downsample_bn')(identity)
        return nn.relu(out + identity)


def max_pool(x, window, stride, padding=0):
    """Torch-style MaxPool2d (NHWC)."""
    w = _pair(window)
    s = _pair(stride)
    p = _pair(padding)
    return nn.max_pool(x, (w[0], w[1]), strides=(s[0], s[1]),
                       padding=((p[0], p[0]), (p[1], p[1])))


def upsample_nearest(x, scale: Union[int, Tuple[int, int]]):
    """Nearest-neighbor upsample by integer factors (NHWC)."""
    sh, sw = _pair(scale)
    if sh > 1:
        x = jnp.repeat(x, sh, axis=1)
    if sw > 1:
        x = jnp.repeat(x, sw, axis=2)
    return x


class TorchLSTMCellScan(nn.Module):
    """Single-direction LSTM over (N, T, In) via lax.scan, with torch's
    parameterization (gate order i,f,g,o; both b_ih and b_hh) so .pth weights
    map 1:1."""
    hidden_size: int
    reverse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, T, In = x.shape
        H = self.hidden_size
        # torch nn.LSTM init: symmetric U(-1/sqrt(H), 1/sqrt(H)) — flax's
        # uniform() samples [0, scale) only, which would start from-scratch
        # training at an atypical all-nonnegative parameterization
        def torch_uniform(key, shape, dtype=self.dtype):
            bound = 1.0 / H ** 0.5
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w_ih = self.param('weight_ih', torch_uniform, (4 * H, In))
        w_hh = self.param('weight_hh', torch_uniform, (4 * H, H))
        b_ih = self.param('bias_ih', torch_uniform, (4 * H,))
        b_hh = self.param('bias_hh', torch_uniform, (4 * H,))

        # hoist the input projection out of the scan: one big MXU matmul
        xw = jnp.einsum('nti,gi->ntg', x, w_ih,
                        preferred_element_type=jnp.float32).astype(self.dtype)
        xw = xw + b_ih + b_hh
        if self.reverse:
            xw = jnp.flip(xw, axis=1)

        def step(carry, xt):
            h, c = carry
            gates = xt + h @ w_hh.T
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((N, H), self.dtype), jnp.zeros((N, H), self.dtype))
        _, hs = jax.lax.scan(step, init, jnp.swapaxes(xw, 0, 1))
        hs = jnp.swapaxes(hs, 0, 1)
        if self.reverse:
            hs = jnp.flip(hs, axis=1)
        return hs


class TorchGRUCellScan(nn.Module):
    """Single-direction GRU over (N, T, In) via lax.scan, with torch's
    parameterization (gate order r,z,n; both b_ih and b_hh; b_hn sits
    INSIDE the reset-gate product, torch nn.GRU docs) so .pth weights map
    1:1 through the same converter kinds as the LSTM (weight_ih (3H, In),
    weight_hh (3H, H), bias_ih, bias_hh). Backs the reference's
    ``enc_gru``/``dec_gru`` SAR options (sar_encoder.py:62-69,
    sar_decoder.py:88-96)."""
    hidden_size: int
    reverse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, T, In = x.shape
        H = self.hidden_size

        def torch_uniform(key, shape, dtype=self.dtype):
            bound = 1.0 / H ** 0.5
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w_ih = self.param('weight_ih', torch_uniform, (3 * H, In))
        w_hh = self.param('weight_hh', torch_uniform, (3 * H, H))
        b_ih = self.param('bias_ih', torch_uniform, (3 * H,))
        b_hh = self.param('bias_hh', torch_uniform, (3 * H,))

        # hoist the input projection out of the scan (one big MXU matmul);
        # unlike the LSTM, b_hh cannot be folded in: b_hn is multiplied by
        # the reset gate, so the hidden-side projection stays in the step
        xw = jnp.einsum('nti,gi->ntg', x, w_ih,
                        preferred_element_type=jnp.float32).astype(self.dtype)
        xw = xw + b_ih
        if self.reverse:
            xw = jnp.flip(xw, axis=1)

        def step(h, xt):
            hw = h @ w_hh.T + b_hh
            xr, xz, xn = jnp.split(xt, 3, axis=-1)
            hr, hz, hn = jnp.split(hw, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        init = jnp.zeros((N, H), self.dtype)
        _, hs = jax.lax.scan(step, init, jnp.swapaxes(xw, 0, 1))
        hs = jnp.swapaxes(hs, 0, 1)
        if self.reverse:
            hs = jnp.flip(hs, axis=1)
        return hs


class BidirectionalLSTM(nn.Module):
    """nn.LSTM(bidirectional=True) + Linear, as in CRNN
    (reference lstm_layer.py:5-21)."""
    hidden_size: int
    out_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fwd = TorchLSTMCellScan(self.hidden_size, reverse=False,
                                dtype=self.dtype, name='fwd')(x)
        bwd = TorchLSTMCellScan(self.hidden_size, reverse=True,
                                dtype=self.dtype, name='bwd')(x)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.out_size, dtype=self.dtype, name='embedding')(h)
