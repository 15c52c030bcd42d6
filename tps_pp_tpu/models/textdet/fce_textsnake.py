"""FCENet + TextSnake text detectors (SURVEY §2.8; VERDICT r1 missing #2).

Device-side modules (flax/NHWC):
  * ``FPNDet``    — plain FPN returning per-level maps (the mmdet FPN the
    FCENet config uses; reference configs/_base_/det_models/fcenet_r50_fpn.py)
  * ``FCEHead``   — shared 3x3 cls (4ch) + reg (2*(2k+1)ch) convs per level
    (reference ``dense_heads/fce_head.py:13-136``)
  * ``FCELoss``   — OHEM text CE, center CE, smooth-L1 on Fourier-
    reconstructed contours (reference ``losses/fce_loss.py:12-207``),
    vectorized with static-shape masking
  * ``FPN_UNet``  — U-Net FPN for TextSnake/DRRG
    (reference ``necks/fpn_unet.py:10-110``)
  * ``TextSnakeHead`` — 1x1 conv to 5 maps [text, center, sin, cos, radius]
    (reference ``dense_heads/textsnake_head.py``)
  * ``TextSnakeLoss`` — balanced BCE + masked center/radius/sin/cos
    (reference ``losses/textsnake_loss.py:12-200``)

Host-side target generators / postprocessors live in targets.py and
postprocess.py over the shared sidelines.py geometry.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import HEADS, LOSSES, NECKS
from .pan import _resize


@NECKS.register_module()
class FPNDet(nn.Module):
    """Standard FPN: lateral 1x1 + top-down add + 3x3 smooth, returning all
    levels (FCENet consumes the last 3 at strides 8/16/32)."""
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f'lateral{i}')(x) for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + _resize(laterals[i], h, w)
        return tuple(
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f'fpn{i}')(la)
            for i, la in enumerate(laterals))


@HEADS.register_module()
class FCEHead(nn.Module):
    """Per-level cls (2 text + 2 center) + reg (2*(2k+1) Fourier) maps,
    shared convs across levels (reference fce_head.py:90-136)."""
    in_channels: int = 256
    fourier_degree: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        k = 2 * self.fourier_degree + 1
        cls_conv = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)),
                           dtype=self.dtype, name='out_conv_cls')
        reg_conv = nn.Conv(2 * k, (3, 3), padding=((1, 1), (1, 1)),
                           dtype=self.dtype, name='out_conv_reg')
        return tuple((cls_conv(f), reg_conv(f)) for f in feats)


def _fourier2poly_mats(fourier_degree: int, num_sample: int):
    """cos/sin transform matrices (reference fce_loss.py:167-207)."""
    k_vect = np.arange(-fourier_degree, fourier_degree + 1,
                       dtype=np.float32).reshape(-1, 1)
    i_vect = np.arange(0, num_sample, dtype=np.float32).reshape(1, -1)
    t = 2 * np.pi / num_sample * (k_vect @ i_vect)
    return jnp.asarray(np.cos(t)), jnp.asarray(np.sin(t))


def _masked_mean(x, mask, eps=1e-6):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), eps)


def _ohem_ce(logits2, target, train_mask, ohem_ratio):
    """OHEM binary CE over 2-class logits (reference fce_loss.py:142-165):
    all positives + top-k negatives, normalized by n_pos + n_neg."""
    logp = jax.nn.log_softmax(logits2.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
    pos = (target > 0) & (train_mask > 0)
    neg = (target == 0) & (train_mask > 0)
    n_pos = jnp.sum(pos)
    # reference OHEM (fce_loss.py:152-156): ratio*n_pos negatives when
    # positives exist; the 100 fallback applies ONLY at n_pos == 0 — a
    # floor would over-sample background on sparse levels (p5 often has
    # <34 positive pixels)
    n_keep = jnp.where(n_pos > 0, ohem_ratio * n_pos, 100)
    n_neg = jnp.minimum(jnp.sum(neg), n_keep.astype(jnp.int32))
    neg_losses = jnp.sort(jnp.where(neg, ce, -jnp.inf))[::-1]
    keep = (jnp.arange(neg_losses.shape[0]) < n_neg)
    neg_sum = jnp.sum(jnp.where(keep & jnp.isfinite(neg_losses),
                                neg_losses, 0.0))
    return (jnp.sum(ce * pos) + neg_sum) / jnp.maximum(
        (n_pos + n_neg).astype(jnp.float32), 1.0)


def _smooth_l1(x, y):
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


@LOSSES.register_module()
class FCELoss:
    """Reference losses/fce_loss.py with static shapes. Targets per level:
    (N, H, W, 4k+5) maps [tr, tcl, effective, x(2k+1), y(2k+1)]."""

    def __init__(self, fourier_degree=5, num_sample=50, ohem_ratio=3.0,
                 **kwargs):
        self.fourier_degree = fourier_degree
        self.num_sample = num_sample
        self.ohem_ratio = ohem_ratio

    def _forward_single(self, cls_pred, reg_pred, gt):
        k = 2 * self.fourier_degree + 1
        N = cls_pred.shape[0]
        tr_pred = cls_pred[..., :2].reshape(-1, 2)
        tcl_pred = cls_pred[..., 2:].reshape(-1, 2)
        x_pred = reg_pred[..., :k].reshape(-1, k).astype(jnp.float32)
        y_pred = reg_pred[..., k:].reshape(-1, k).astype(jnp.float32)

        tr_mask = gt[..., 0].reshape(-1).astype(jnp.int32)
        tcl_mask = gt[..., 1].reshape(-1).astype(jnp.int32)
        train_mask = gt[..., 2].reshape(-1).astype(jnp.int32)
        x_map = gt[..., 3:3 + k].reshape(-1, k).astype(jnp.float32)
        y_map = gt[..., 3 + k:].reshape(-1, k).astype(jnp.float32)

        tr_train = (tr_mask * train_mask).astype(jnp.float32)
        loss_tr = _ohem_ce(tr_pred, tr_mask, train_mask, self.ohem_ratio)

        # tcl: CE over text positions + 0.5 * CE over the rest
        logp = jax.nn.log_softmax(tcl_pred.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, tcl_mask[:, None], axis=-1)[:, 0]
        has_pos = jnp.sum(tr_train) > 0
        loss_tcl = jnp.where(
            has_pos,
            _masked_mean(ce, tr_train) + 0.5 * _masked_mean(ce, 1 - tr_train),
            0.0)

        # regression on reconstructed contours
        cos_m, sin_m = _fourier2poly_mats(self.fourier_degree,
                                          self.num_sample)

        def f2p(real, imag):
            x = real @ cos_m - imag @ sin_m
            y = real @ sin_m + imag @ cos_m
            return x, y

        ft_x, ft_y = f2p(x_map, y_map)
        ft_xp, ft_yp = f2p(x_pred, y_pred)
        weight = (tr_mask.astype(jnp.float32) +
                  tcl_mask.astype(jnp.float32)) / 2
        wm = (weight * tr_train)[:, None]
        denom = jnp.maximum(jnp.sum(tr_train) * self.num_sample, 1.0)
        loss_reg_x = jnp.where(
            has_pos, jnp.sum(_smooth_l1(ft_xp, ft_x) * wm) / denom, 0.0)
        loss_reg_y = jnp.where(
            has_pos, jnp.sum(_smooth_l1(ft_yp, ft_y) * wm) / denom, 0.0)
        return loss_tr, loss_tcl, loss_reg_x, loss_reg_y

    def __call__(self, preds, targets):
        """preds: tuple of (cls (N,H,W,4), reg (N,H,W,2(2k+1))) per level;
        targets: dict with 'p3_maps'/'p4_maps'/'p5_maps' (N, H, W, 4k+5)."""
        keys = ['p3_maps', 'p4_maps', 'p5_maps'][:len(preds)]
        tot = [0.0, 0.0, 0.0, 0.0]
        for (cls_p, reg_p), key in zip(preds, keys):
            parts = self._forward_single(cls_p, reg_p, targets[key])
            tot = [a + b for a, b in zip(tot, parts)]
        return {'loss_text': tot[0], 'loss_center': tot[1],
                'loss_reg_x': tot[2], 'loss_reg_y': tot[3]}


# -------------------------------------------------------------- TextSnake --

class UpBlock(nn.Module):
    """1x1 -> 3x3 -> deconv x2 (reference fpn_unet.py:10-30)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                            name='conv1x1')(x))
        x = nn.relu(nn.Conv(self.out_channels, (3, 3),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name='conv3x3')(x))
        # flax ConvTranspose 'SAME' gives the exact 2x upsample torch gets
        # from ConvTranspose2d(k=4, s=2, p=1)
        return nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                                padding='SAME', dtype=self.dtype,
                                name='deconv')(x)


@NECKS.register_module()
class FPN_UNet(nn.Module):
    """U-Net-like FPN for TextSnake / DRRG (reference fpn_unet.py:33-110):
    output is at the full input resolution."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        c2, c3, c4, c5 = inputs
        out_chs = [self.out_channels] + [
            min(self.out_channels * 2 ** i, 256) for i in range(4)]
        x = nn.relu(nn.ConvTranspose(out_chs[4], (4, 4), strides=(2, 2),
                                     padding='SAME',
                                     dtype=self.dtype, name='up4')(c5))
        x = jnp.concatenate([x, c4], axis=-1)
        x = nn.relu(UpBlock(out_chs[3], self.dtype, name='up_block3')(x))
        x = jnp.concatenate([x, c3], axis=-1)
        x = nn.relu(UpBlock(out_chs[2], self.dtype, name='up_block2')(x))
        x = jnp.concatenate([x, c2], axis=-1)
        x = nn.relu(UpBlock(out_chs[1], self.dtype, name='up_block1')(x))
        return UpBlock(out_chs[0], self.dtype, name='up_block0')(x)


@HEADS.register_module()
class TextSnakeHead(nn.Module):
    """1x1 conv -> 5 maps (reference textsnake_head.py:31-80)."""
    out_channels: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name='out_conv')(x)


@LOSSES.register_module()
class TextSnakeLoss:
    """Reference losses/textsnake_loss.py:12-200 with static-shape OHEM."""

    def __init__(self, ohem_ratio=3.0, **kwargs):
        self.ohem_ratio = ohem_ratio

    def _balanced_bce(self, prob, gt, mask):
        gt = gt.astype(jnp.float32).reshape(-1)
        mask = mask.astype(jnp.float32).reshape(-1)
        prob = prob.astype(jnp.float32).reshape(-1)
        eps = 1e-6
        loss = -(gt * jnp.log(prob + eps) +
                 (1 - gt) * jnp.log(1 - prob + eps))
        pos = gt * mask
        neg = (1 - gt) * mask
        n_pos = jnp.sum(pos)
        # same reference OHEM rule as _ohem_ce: the 100-negative
        # fallback only when there are no positives at all
        n_keep = jnp.where(n_pos > 0, n_pos * self.ohem_ratio, 100.0)
        n_neg = jnp.minimum(jnp.sum(neg), n_keep).astype(jnp.int32)
        neg_losses = jnp.sort(jnp.where(neg > 0, loss, -jnp.inf))[::-1]
        keep = jnp.arange(neg_losses.shape[0]) < n_neg
        neg_sum = jnp.sum(jnp.where(keep & jnp.isfinite(neg_losses),
                                    neg_losses, 0.0))
        return (jnp.sum(loss * pos) + neg_sum) / (
            n_pos + n_neg.astype(jnp.float32) + 1e-5)

    def __call__(self, preds, targets):
        """preds: (N, H, W, 5) raw maps; targets: gt_text_mask,
        gt_center_region_mask, gt_mask, gt_radius_map, gt_sin_map,
        gt_cos_map — all (N, H, W) at pred resolution."""
        pred_text = jax.nn.sigmoid(preds[..., 0].astype(jnp.float32))
        pred_center = jax.nn.sigmoid(preds[..., 1].astype(jnp.float32))
        pred_sin = preds[..., 2].astype(jnp.float32)
        pred_cos = preds[..., 3].astype(jnp.float32)
        pred_radius = preds[..., 4].astype(jnp.float32)
        scale = jnp.sqrt(1.0 / (pred_sin ** 2 + pred_cos ** 2 + 1e-8))
        pred_sin, pred_cos = pred_sin * scale, pred_cos * scale

        gt_text = targets['gt_text_mask'].astype(jnp.float32)
        gt_center = targets['gt_center_region_mask'].astype(jnp.float32)
        gt_mask = targets['gt_mask'].astype(jnp.float32)
        gt_radius = targets['gt_radius_map'].astype(jnp.float32)
        gt_sin = targets['gt_sin_map'].astype(jnp.float32)
        gt_cos = targets['gt_cos_map'].astype(jnp.float32)

        loss_text = self._balanced_bce(pred_text, gt_text, gt_mask)
        text_mask = gt_text * gt_mask
        eps = 1e-6
        bce_center = -(gt_center * jnp.log(pred_center + eps) +
                       (1 - gt_center) * jnp.log(1 - pred_center + eps))
        loss_center = _masked_mean(bce_center, text_mask)
        center_mask = gt_center * gt_mask
        loss_radius = _masked_mean(
            _smooth_l1(pred_radius / (gt_radius + 1e-2),
                       jnp.ones_like(pred_radius)), center_mask)
        loss_sin = _masked_mean(_smooth_l1(pred_sin, gt_sin), center_mask)
        loss_cos = _masked_mean(_smooth_l1(pred_cos, gt_cos), center_mask)
        return {'loss_text': loss_text, 'loss_center': loss_center,
                'loss_radius': loss_radius, 'loss_sin': loss_sin,
                'loss_cos': loss_cos}


class FCENetModule(nn.Module):
    """backbone -> FPNDet (last 3 levels) -> FCEHead
    (reference detectors/fcenet.py is a SingleStageTextDetector tag)."""
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    def __call__(self, img, train: bool = False):
        feats = self.backbone(img, train=train)
        feats = feats[-len(self.neck.in_channels):]
        # the neck emits exactly one level per in_channel; feed them ALL to
        # the head (a separate num_levels knob could silently drop a level
        # while the loss keys still assumed the first pred was p3)
        levels = self.neck(feats, train=train)
        return self.head(levels, train=train)


class TextSnakeModule(nn.Module):
    """backbone -> FPN_UNet -> TextSnakeHead
    (reference detectors/textsnake.py)."""
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    def __call__(self, img, train: bool = False):
        feats = self.backbone(img, train=train)
        x = self.neck(feats, train=train)
        return self.head(x, train=train)
