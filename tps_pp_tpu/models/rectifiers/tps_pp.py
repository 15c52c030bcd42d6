"""TPS++ — Attention-Enhanced Thin-Plate Spline rectifier (the paper's core).

TPU-native re-implementation of reference
``mmocr/models/textrecog/backbones/tps_pp/tps_pp.py`` (top module :499-626,
MSFA :84-229, CBAM :27-82, TPE :231-325, Attention_Enhanced_TPS :328-496) and
``tps_pp/DGAB.py``. Semantics preserved for checkpoint compatibility:

  * control points + sampling grid live in **[0,1]** but are fed unchanged to
    a sampler with torch's [-1,1] convention, ``padding_mode='border'``,
    ``align_corners=True`` (reference tps_pp.py:606-615) — faithful quirk,
    do not "fix".
  * pc_score uses **tanh** (tps_pp.py:299), scale = C^-0.5.
  * TPS kernel r^2 log(r+eps), eps=1e-6 inside the log for P_hat
    (tps_pp.py:463); fill_diagonal(1) for C-C (tps_pp.py:390).
  * localization fc2 zero-weight + meshgrid-bias init in [0,1]
    (tps_pp.py:278-285).
  * The dynamic ``build_inv_delta_C`` path (tps_pp.py:408-435) is dead code
    in the reference and intentionally not carried over (SURVEY §7.4).

Internally the spatially-gated blocks run in (N, C, H, W) index order like
the reference (their Linears act on the width axis); the module's public
boundary is NHWC like the rest of the framework.

The grid-generation + double-grid-sample tail can run through three backends
(``sample_mode``): 'gather' (jnp gathers), 'onehot' (gather-free MXU
contractions), or 'pallas' (fused Pallas kernel in ops/pallas_tps.py).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import tps as tps_ops
from ...ops.grid_sample import grid_sample, grid_sample_onehot
from ...registry import RECTIFIERS
from ..layers import ConvModule, upsample_nearest

Dtype = Any


class ChannelAttention(nn.Module):
    """CBAM channel gate (reference tps_pp.py:27-50)."""
    channels: int
    ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (N,H,W,C)
        hidden = max(1, self.channels // self.ratio)
        mlp = [nn.Dense(hidden, use_bias=False, dtype=self.dtype, name='fc1'),
               nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                        name='fc2')]

        def shared(v):
            v = mlp[0](v)
            v = nn.relu(v)
            return mlp[1](v)

        avg = shared(jnp.mean(x, axis=(1, 2)))
        mx = shared(jnp.max(x, axis=(1, 2)))
        return jax.nn.sigmoid(avg + mx)[:, None, None, :]


class SpatialAttention(nn.Module):
    """CBAM spatial gate — 3x3 conv over [mean,max] channel maps
    (reference tps_pp.py:53-65)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([avg, mx], axis=-1)
        s = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name='conv')(s)
        return jax.nn.sigmoid(s)


class CBAM(nn.Module):
    channels: int
    ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ChannelAttention(self.channels, self.ratio, self.dtype,
                             name='channel_attention')(x) * x
        x = SpatialAttention(self.dtype, name='spatial_attention')(x) * x
        return x


class MSFA(nn.Module):
    """Multi-Scale Feature Aggregation U-Net (reference tps_pp.py:84-229).

    Encoder strides (1, 2, 2, (2,1)) take the 192ch 16x64 concat down to the
    64ch 2x16 fiducial grid; CBAM at the bottleneck; decoder mirrors with
    nearest upsampling and additive skips."""
    in_channels: int = 64      # num_img_channel
    num_channels: int = 64
    u_channel: int = 3         # concat multiplicity (num_map)
    stride: int = 2            # p_stride
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (N, 16, 64, in_channels*u_channel)
        c = self.num_channels
        enc_specs = [(c, 1), (c, 2), (c, self.stride), (c, (2, 1))]
        feats = []
        k = x
        for i, (ch, s) in enumerate(enc_specs):
            k = ConvModule(ch, 3, stride=s, padding=1, dtype=self.dtype,
                           name=f'enc{i}')(k)
            feats.append(k)
        point = feats[-1]                      # (N, 2, 16, 64)
        k = CBAM(c, dtype=self.dtype, name='atten')(point)

        dec_specs = [((2, 1), c), (self.stride, c), (2, c)]
        for i, (scale, ch) in enumerate(dec_specs):
            k = upsample_nearest(k, scale)
            k = ConvModule(ch, 3, stride=1, padding=1, dtype=self.dtype,
                           name=f'dec{i}')(k)
            k = k + feats[len(dec_specs) - 1 - i]
        k = ConvModule(self.in_channels, 3, stride=1, padding=1,
                       dtype=self.dtype, name='dec3')(k)
        return {'de_feat': k, 'en_feat': point}


class DGABBlock(nn.Module):
    """Dual Gated Attention Block core (reference DGAB.py:25-55).

    Operates in (N, C, H, W) index order; ``proj`` is a Linear over the LAST
    axis (width) — the reference's nn.Linear(dim, dim) relies on width == dim
    == 64, a quirk we replicate deliberately."""
    dim: int
    point: int
    height: int
    width: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        # x: (N, C, H, W); y: (N, T=point, C) fiducial tokens
        y = jnp.swapaxes(y, 1, 2)                       # (N, C, T)
        w = nn.Dense(self.width + 1, use_bias=False, dtype=self.dtype,
                     name='mlp_w')(
            jnp.concatenate([x.mean(axis=2), y], axis=2))
        v_w = jax.nn.softmax(w[:, :, :-1], axis=-1)[:, :, None, :]
        h = nn.Dense(self.height + 1, use_bias=False, dtype=self.dtype,
                     name='mlp_h')(
            jnp.concatenate([x.mean(axis=3), y], axis=2))
        v_h = jax.nn.softmax(h[:, :, :-1], axis=-1)[:, :, :, None]
        x = (v_h * x * h[:, :, -1][..., None, None] +
             v_w * x * w[:, :, -1][..., None, None])
        # reference nn.Linear(dim, dim) acts on the width axis and relies on
        # width == dim == 64 (DGAB.py:36,52); sized by width for shape
        # correctness — identical when width == dim
        x = nn.Dense(self.width, dtype=self.dtype, name='proj')(x)
        return x


class DGAB(nn.Module):
    """Pre-norm DGAB wrapper (reference DGAB.py:58-77): LayerNorm over the
    (H, W) spatial tuple, gated attention, then a width-axis MLP."""
    dim: int
    point: int
    height: int
    width: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        # epsilon=1e-5: torch nn.LayerNorm default (reference DGAB.py:66-71
        # norm_layer(tuple_dim) never overrides eps); flax defaults to 1e-6,
        # which diverges hard on low-variance activations (var ~ eps)
        norm = lambda name: nn.LayerNorm(  # noqa: E731
            reduction_axes=(-2, -1), feature_axes=(-2, -1), epsilon=1e-5,
            dtype=self.dtype, name=name)
        x = x + DGABBlock(self.dim, self.point, self.height, self.width,
                          self.dtype, name='attn')(norm('norm1')(x), y)
        h = norm('norm2')(x)
        # reference Mlp(dim, dim*4) also acts on the width axis (see
        # DGABBlock.proj note) — sized by width for shape correctness
        h = nn.Dense(int(self.width * self.mlp_ratio), dtype=self.dtype,
                     name='mlp_fc1')(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, dtype=self.dtype, name='mlp_fc2')(h)
        return x + h


class TPE(nn.Module):
    """Transformation Parameter Estimation (reference tps_pp.py:231-325)."""
    num_img_channel: int = 64
    point_size: Tuple[int, int] = (2, 16)
    img_size: Tuple[int, int] = (16, 64)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, en_feat, de_feat):
        # en_feat: (N, py, px, C_en) NHWC (C_en = MSFA bottleneck width);
        # de_feat: (N, H, W, C) NHWC
        py, px = self.point_size
        num_fiducial = py * px
        N = en_feat.shape[0]
        C = self.num_img_channel
        assert en_feat.shape[1] * en_feat.shape[2] == num_fiducial, (
            f'MSFA bottleneck {en_feat.shape[1:3]} != point_size '
            f'{self.point_size}; check img_size/point_size consistency')
        en_tokens = en_feat.reshape(N, num_fiducial, en_feat.shape[-1])

        # DGAB runs in (N, C, H, W) index order
        x = de_feat.transpose(0, 3, 1, 2)
        x = DGAB(C, num_fiducial, self.img_size[0], self.img_size[1],
                 dtype=self.dtype, name='atten0')(x, en_tokens)
        de_feat = x.transpose(0, 2, 3, 1)

        # control points: fc1 (64->256->ReLU->2->ReLU) per token, flatten,
        # fc2 zero-weight + meshgrid bias (tps_pp.py:270-285)
        h = nn.Dense(256, dtype=self.dtype, name='loc_fc1_0')(en_tokens)
        h = nn.relu(h)
        h = nn.Dense(2, dtype=self.dtype, name='loc_fc1_1')(h)
        h = nn.relu(h)
        ctrl_x = (np.linspace(0.1, px - 0.1, num=px) / px)
        ctrl_y = (np.linspace(0.1, py - 0.1, num=py) / py)
        bias_init = np.stack(np.meshgrid(ctrl_x, ctrl_y),
                             axis=2).reshape(-1).astype(np.float32)
        cp = nn.Dense(num_fiducial * 2, dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      bias_init=lambda *a: jnp.asarray(bias_init),
                      name='loc_fc2')(h.reshape(N, -1))
        control_point = cp.reshape(N, num_fiducial, 2)

        # attention score: tanh(f @ p1^T * C^-0.5) (tps_pp.py:293-312)
        p1 = nn.Dense(32, dtype=self.dtype, name='p_linear_0')(en_tokens)
        p1 = nn.Dense(128, dtype=self.dtype, name='p_linear_1')(p1)
        f = de_feat.reshape(N, -1, C)
        f = nn.Dense(32, dtype=self.dtype, name='feat_linear_0')(f)
        f = nn.Dense(128, dtype=self.dtype, name='feat_linear_1')(f)
        score = jnp.einsum('nmc,nfc->nmf', f, p1,
                           preferred_element_type=jnp.float32)
        pc_score = jnp.tanh(score * (C ** -0.5)).astype(self.dtype)
        return control_point, pc_score


@RECTIFIERS.register_module()
class TPS_PP(nn.Module):
    """Top module (reference tps_pp.py:499-626), 'ResNet45v2' variant.

    Inputs (NHWC): ``batch_img`` — stage-2 feature (N, 16, 64, 64);
    ``skips`` — [stem (N,32,128,32), layer1-out (N,32,128,32)].
    Returns dict with the rectified feature ('output', (N,16,64,64)),
    rectified reference feature ('mp_img') and 'pc_score'.
    """
    img_size: Tuple[int, int] = (16, 64)
    rectified_img_size: Tuple[int, int] = (16, 64)
    num_img_channel: int = 64
    point_size: Tuple[int, int] = (2, 16)
    p_stride: int = 2
    # 'pallas'  — fused kernel, VMEM-tiled (production path on TPU);
    # 'onehot'  — gather-free XLA contractions (materializes an (N, n, W*C)
    #             intermediate in HBM: fine at small batch, OOM at scale);
    # 'gather'  — jnp gathers (reference-faithful fallback, any backend)
    sample_mode: str = 'gather'
    pallas_tile: int = 1024
    dtype: Dtype = jnp.float32

    def setup(self):
        C = self.num_img_channel
        self.down0 = ConvModule(C, 1, stride=1, dtype=self.dtype)
        self.down1 = ConvModule(C, 1, stride=1, dtype=self.dtype)
        self.down2 = ConvModule(C, 1, stride=1, dtype=self.dtype)
        self.down0_1 = ConvModule(C, 3, stride=2, padding=1, dtype=self.dtype)
        self.down1_1 = ConvModule(C, 3, stride=2, padding=1, dtype=self.dtype)
        self.down_feat = ConvModule(C, 1, stride=1, dtype=self.dtype)
        # num_channels == num_img_channel (both 64 in the reference,
        # tps_pp.py:533 + :200-205); DGAB requires the equality
        self.MSFA = MSFA(in_channels=C, num_channels=C, u_channel=3,
                         stride=self.p_stride, dtype=self.dtype)
        self.TPE = TPE(C, self.point_size, self.img_size, dtype=self.dtype)

        # static TPS matrices (reference registers these as buffers,
        # tps_pp.py:357-366); they are deterministic functions of the config
        fid_C = tps_ops.build_C_cell_centers(self.point_size)
        self.inv_delta_C = jnp.asarray(
            tps_ops.build_inv_delta_C(fid_C), dtype=jnp.float32)
        P = tps_ops.build_P_cell_centers(self.rectified_img_size[1],
                                         self.rectified_img_size[0])
        self.P = jnp.asarray(P, dtype=jnp.float32)
        self.P_hat = jnp.asarray(
            tps_ops.build_P_hat(fid_C, P, eps=1e-6), dtype=jnp.float32)

    def __call__(self, batch_img, skips, train: bool = False):
        feat0 = self.down0(skips[0])            # (N, 32, 128, C)
        feat1 = self.down1(skips[1])            # (N, 32, 128, C)
        feat2 = self.down2(batch_img)           # (N, 16, 64, C)
        feat_cat = jnp.concatenate(
            [self.down0_1(feat0), self.down1_1(feat1), feat2], axis=-1)
        # full-res reference feature for sampling (reference grid(),
        # tps_pp.py:560-562)
        feat_grid = self.down_feat(jnp.concatenate(
            [feat0, feat1, upsample_nearest(feat2, 2)], axis=-1))

        logits = self.MSFA(feat_cat)
        control_point, pc_score = self.TPE(logits['en_feat'],
                                           logits['de_feat'])

        Hr, Wr = self.rectified_img_size
        # the fused pallas sampler is a serving-path kernel with no autodiff
        # rule; under train=True fall back to the differentiable gather
        # sampler (numerically equivalent — tests/test_pallas_tps.py)
        sample_mode = self.sample_mode
        if train and sample_mode == 'pallas':
            sample_mode = 'gather'
        if sample_mode == 'pallas':
            from ...ops.pallas_tps import tps_grid_sample_fused
            # with_mp=False: the reference computes a second warp of the
            # stage-2 feature and returns it as 'mp_img' (tps_pp.py:611,
            # :622) but NO code path consumes it — the serving kernel
            # skips that warp (~2 ms at B=512)
            rect, mp_img = tps_grid_sample_fused(
                feat_grid, batch_img, control_point.astype(jnp.float32),
                pc_score.astype(jnp.float32), self.inv_delta_C, self.P_hat,
                self.P, (Hr, Wr), tile=self.pallas_tile, with_mp=False)
        else:
            # grid math needs >= f32 (bf16 grids visibly misplace samples);
            # promote rather than hard-cast so f64 parity probes stay f64
            gdt = jnp.promote_types(control_point.dtype, jnp.float32)
            grid = tps_ops.build_P_prime(
                control_point.astype(gdt), pc_score.astype(gdt),
                self.inv_delta_C, self.P_hat, self.P)     # (N, Hr*Wr, 2)
            if sample_mode == 'onehot':
                rect = grid_sample_onehot(feat_grid, grid)
                mp_img = grid_sample_onehot(batch_img, grid)
                rect = rect.reshape(-1, Hr, Wr, rect.shape[-1])
                mp_img = mp_img.reshape(-1, Hr, Wr, mp_img.shape[-1])
            else:
                g = grid.reshape(-1, Hr, Wr, 2)
                rect = grid_sample(feat_grid, g)
                mp_img = grid_sample(batch_img, g)

        return {
            'output': rect.astype(batch_img.dtype),
            'mp_img': (None if mp_img is None
                       else mp_img.astype(batch_img.dtype)),
            'pc_score': pc_score,
            'control_point': control_point,
        }
