"""PANet + PSENet text detectors (SURVEY §2.8; VERDICT r1 missing #2).

TPU-native re-implementation of the reference stack:
  * ``FPEM_FFM``  — separable-conv feature pyramid enhancement + fusion
    (reference ``textdet/necks/fpem_ffm.py:9-173``): channel-reduce C2-C5 to
    128, run ``fpem_repeat`` FPEM up/down passes with additive FFM, upsample
    all to 1/4 scale.
  * ``FPNF``      — FPN with concat fusion for PSENet
    (reference ``textdet/necks/fpnf.py:10-130``).
  * ``PANHead`` / ``PSEHead`` — concat + 1x1 conv to 6 / 7 channels
    (reference ``dense_heads/pan_head.py:14-91``, ``pse_head.py``).
  * ``PANLoss``   — text/kernel dice with OHEM + the aggregation /
    discrimination embedding losses (reference ``losses/pan_loss.py:15-333``),
    vectorized over a static ``max_instances`` axis instead of the
    reference's per-instance python loops (XLA needs static shapes; masked
    instances contribute zero).
  * ``PSELoss``   — text dice with OHEM + per-kernel dice
    (reference ``losses/pse_loss.py:9-108``).
  * ``ResNetDet50`` — bottleneck trunk for PSENet-R50 (the reference uses
    mmdet:ResNet depth=50).

Host-side counterparts live in targets.py (PANetTargets/PSENetTargets) and
postprocess.py (PANPostprocessor/PSEPostprocessor over the first-party
pixel_group / contour_expand native ops).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES, HEADS, LOSSES, NECKS
from ..layers import max_pool


def _resize(x, h, w, method='nearest'):
    N, _, _, C = x.shape
    return jax.image.resize(x, (N, h, w, C), method)


class Bottleneck(nn.Module):
    """torchvision-style bottleneck (1x1 -> 3x3(stride) -> 1x1 x4).

    ``dcn=True`` swaps the 3x3 for a modulated deformable conv (DCNv2) —
    the reference's dcn=dict(type='DCNv2') stages in
    dbnet_r50dcnv2_fpnc.py / fcenet_r50dcnv2_fpn.py."""
    planes: int
    stride: int = 1
    use_downsample: bool = False
    dcn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        out = nn.relu(norm('bn1')(out))
        if self.dcn:
            from ...ops.deform_conv import ModulatedDeformConv
            out = ModulatedDeformConv(self.planes, stride=self.stride,
                                      dtype=self.dtype, name='conv2')(out)
        else:
            out = nn.Conv(self.planes, (3, 3),
                          strides=(self.stride, self.stride),
                          padding=((1, 1), (1, 1)), use_bias=False,
                          dtype=self.dtype, name='conv2')(out)
        out = nn.relu(norm('bn2')(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv3')(out)
        out = norm('bn3')(out)
        if self.use_downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = norm('downsample_bn')(identity)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ResNetDet50(nn.Module):
    """ResNet-50 trunk emitting (C2..C5) at strides (4, 8, 16, 32) with
    channels (256, 512, 1024, 2048) — PSENet's backbone (reference config
    psenet_r50_fpnf.py: mmdet.ResNet depth=50)."""
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    base_channels: int = 64
    # reference dcn stages (stage_with_dcn=(False, True, True, True) in
    # dbnet_r50dcnv2_fpnc.py); the `dcn` cfg dict itself is accepted for
    # config compatibility but only DCNv2 semantics are implemented
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    dcn: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name='stem_conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='stem_bn')(x)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)
        outs = []
        ch = self.base_channels
        for si, blocks in enumerate(self.stage_blocks):
            stride = 1 if si == 0 else 2
            dcn = bool(self.stage_with_dcn[si]) if self.dcn else False
            for b in range(blocks):
                s = stride if b == 0 else 1
                needs_ds = s != 1 or x.shape[-1] != ch * 4
                x = Bottleneck(ch, stride=s, use_downsample=needs_ds,
                               dcn=dcn, dtype=self.dtype,
                               name=f'layer{si + 1}_block{b}')(x, train=train)
            outs.append(x)
            ch *= 2
        return tuple(outs)


class SeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 + BN + ReLU
    (reference fpem_ffm.py:50-74)."""
    channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(x.shape[-1], (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=x.shape[-1],
                    dtype=self.dtype, name='depthwise')(x)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    name='pointwise')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        return nn.relu(x)


class FPEM(nn.Module):
    """One feature pyramid enhancement pass (reference fpem_ffm.py:9-48):
    top-down upsample-adds then bottom-up stride-2 adds, separable convs."""
    channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c2, c3, c4, c5, train: bool = False):
        def up_add(x, y):
            return _resize(x, y.shape[1], y.shape[2]) + y

        c4 = SeparableConv(self.channels, 1, self.dtype,
                           name='up_add1')(up_add(c5, c4), train)
        c3 = SeparableConv(self.channels, 1, self.dtype,
                           name='up_add2')(up_add(c4, c3), train)
        c2 = SeparableConv(self.channels, 1, self.dtype,
                           name='up_add3')(up_add(c3, c2), train)
        c3 = SeparableConv(self.channels, 2, self.dtype,
                           name='down_add1')(up_add(c3, c2), train)
        c4 = SeparableConv(self.channels, 2, self.dtype,
                           name='down_add2')(up_add(c4, c3), train)
        c5 = SeparableConv(self.channels, 2, self.dtype,
                           name='down_add3')(up_add(c5, c4), train)
        return c2, c3, c4, c5


@NECKS.register_module()
class FPEM_FFM(nn.Module):
    in_channels: Sequence[int] = (64, 128, 256, 512)
    conv_out: int = 128
    fpem_repeat: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        cs = []
        for i, c in enumerate(inputs):
            c = nn.Conv(self.conv_out, (1, 1), dtype=self.dtype,
                        name=f'reduce{i}')(c)
            c = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'reduce_bn{i}')(c)
            cs.append(nn.relu(c))
        c2, c3, c4, c5 = cs
        ffm = None
        for r in range(self.fpem_repeat):
            c2, c3, c4, c5 = FPEM(self.conv_out, self.dtype,
                                  name=f'fpem{r}')(c2, c3, c4, c5, train)
            cur = (c2, c3, c4, c5)
            ffm = cur if ffm is None else tuple(
                a + b for a, b in zip(ffm, cur))
        h, w = ffm[0].shape[1:3]
        outs = [ffm[0]] + [_resize(f, h, w, 'bilinear') for f in ffm[1:]]
        return tuple(outs)


@NECKS.register_module()
class FPNF(nn.Module):
    """FPN with concat fusion (reference fpnf.py:10-130)."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    fusion_type: str = 'concat'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        def cbr(x, ch, k, name):
            x = nn.Conv(ch, (k, k), padding=((k // 2, k // 2),) * 2,
                        use_bias=False, dtype=self.dtype,
                        name=f'{name}_conv')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'{name}_bn')(x)
            return nn.relu(x)

        laterals = [cbr(inputs[i], self.out_channels, 1, f'lateral{i}')
                    for i in range(len(inputs))]
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + _resize(laterals[i], h, w)
            laterals[i - 1] = cbr(laterals[i - 1], self.out_channels, 3,
                                  f'fpn{i - 1}')
        h, w = laterals[0].shape[1:3]
        ups = [laterals[0]] + [_resize(la, h, w) for la in laterals[1:]]
        if self.fusion_type == 'concat':
            out = jnp.concatenate(ups, axis=-1)
        else:
            out = sum(ups)
        return cbr(out, self.out_channels, 3, 'output')


@HEADS.register_module()
class PANHead(nn.Module):
    """Concat multi-scale features + 1x1 conv to raw logits
    (reference pan_head.py:73-91). out_channels: 6 for PANet
    (text, kernel, 4-d embedding), 7 for PSENet (text + 6 kernels)."""
    out_channels: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = jnp.concatenate(inputs, axis=-1) if isinstance(
            inputs, (tuple, list)) else inputs
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name='out_conv')(x)


HEADS.register_module(name='PSEHead', module=PANHead)


def _dice_loss_with_logits(pred, target, mask, smooth=0.001):
    """Per-image dice on sigmoided logits (reference pan_loss.py:258-276)."""
    N = pred.shape[0]
    pred = jax.nn.sigmoid(pred.astype(jnp.float32)).reshape(N, -1)
    target = (target > 0.5).astype(jnp.float32).reshape(N, -1)
    mask = mask.reshape(N, -1)
    pred = pred * mask
    target = target * mask
    a = jnp.sum(pred * target, 1) + smooth
    b = jnp.sum(pred * pred, 1) + smooth
    c = jnp.sum(target * target, 1) + smooth
    return 1 - 2 * a / (b + c)


def _ohem_mask(score, gt_text, gt_mask, ohem_ratio):
    """Top-k negative sampling (reference pan_loss.py:278-311) with static
    shapes: threshold = the (3*pos)-th largest negative score."""
    N = score.shape[0]
    score = score.reshape(N, -1)
    gt_text = gt_text.reshape(N, -1)
    gt_mask = gt_mask.reshape(N, -1)
    pos = (gt_text > 0.5).astype(jnp.float32)
    pos_num = jnp.sum(pos * (gt_mask > 0.5), axis=1)
    neg = 1.0 - pos
    neg_num = jnp.minimum(pos_num * ohem_ratio, jnp.sum(neg, axis=1))
    neg_scores = jnp.where(neg > 0, score, -jnp.inf)
    sorted_neg = jnp.sort(neg_scores, axis=1)[:, ::-1]
    idx = jnp.clip(neg_num.astype(jnp.int32) - 1, 0,
                   sorted_neg.shape[1] - 1)
    thr = jnp.take_along_axis(sorted_neg, idx[:, None], axis=1)
    sampled = (((score >= thr) & (neg > 0)) | (pos > 0)) & (gt_mask > 0.5)
    # degenerate case (no positives or no negatives): whole effective mask
    degen = (pos_num < 1) | (neg_num < 1)
    return jnp.where(degen[:, None], gt_mask > 0.5, sampled).astype(
        jnp.float32).reshape(gt_mask.shape)


@LOSSES.register_module()
class PANLoss:
    """Reference losses/pan_loss.py vectorized over a static instance axis.

    Expects instance-labeled targets from PANetTargets: gt_texts (N,H,W)
    int labels (kernel level 0), gt_kernels (N,H,W) int labels (level 1),
    gt_mask (N,H,W) effective mask.
    """

    def __init__(self, alpha=0.5, beta=0.25, delta_aggregation=0.5,
                 delta_discrimination=3, ohem_ratio=3, reduction='mean',
                 max_instances=24, **kwargs):
        self.alpha = alpha
        self.beta = beta
        self.delta_aggregation = delta_aggregation
        self.delta_discrimination = delta_discrimination
        self.ohem_ratio = ohem_ratio
        self.reduction = reduction
        self.max_instances = max_instances

    @staticmethod
    def _safe_norm(x, axis):
        # norm with a bounded gradient at 0 (jnp.linalg.norm grads NaN there,
        # and masked-out instances hit exactly 0 distance)
        return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis), 1e-12))

    def _aggr_discr(self, texts, kernels, embed):
        """texts/kernels: (N, P) int instance labels; embed: (N, P, 4)."""
        Imax = self.max_instances
        inst = jnp.arange(1, Imax + 1)
        t_mask = (texts[:, None, :] == inst[None, :, None])      # (N, I, P)
        k_mask = (kernels[:, None, :] == inst[None, :, None])
        t_cnt = t_mask.sum(-1).astype(jnp.float32)               # (N, I)
        k_cnt = k_mask.sum(-1).astype(jnp.float32)
        valid = (t_cnt > 0) & (k_cnt > 0)
        vf = valid.astype(jnp.float32)
        # kernel mean embeddings G_Ki (pan_loss.py:206-208)
        k_sum = jnp.einsum('nip,npc->nic', k_mask.astype(jnp.float32), embed)
        avg = k_sum / jnp.maximum(k_cnt, 1.0)[..., None]          # (N, I, 4)
        # aggregation: mean over instance pixels of ln(1 + hinge^2)
        dist = self._safe_norm(embed[:, None] - avg[:, :, None], axis=-1)
        hinge = jnp.maximum(dist - self.delta_aggregation, 0.0) ** 2
        lg = jnp.log(hinge + 1.0) * t_mask
        aggr_i = lg.sum(-1) / jnp.maximum(t_cnt, 1.0)             # (N, I)
        n_inst = vf.sum(-1)                                       # (N,)
        loss_aggr = (aggr_i * vf).sum(-1) / jnp.maximum(n_inst, 1.0)
        # discrimination: pairwise kernel-average hinge (pan_loss.py:231-247)
        pair_d = self._safe_norm(avg[:, :, None] - avg[:, None], axis=-1)
        pair_hinge = jnp.maximum(self.delta_discrimination - pair_d, 0.0) ** 2
        pair_valid = (vf[:, :, None] * vf[:, None] *
                      (1 - jnp.eye(Imax)[None]))
        discr_sum = (jnp.log(pair_hinge + 1.0) * pair_valid).sum((-2, -1)) / 2
        denom = jnp.maximum(n_inst * (n_inst - 1), 1.0)
        loss_discr = jnp.where(n_inst > 1, 2 * discr_sum / denom, 0.0)
        return loss_aggr, loss_discr

    def __call__(self, preds, targets):
        """preds: (N, H, W, 6) raw logits; targets: gt_texts / gt_kernels
        (instance labels) + gt_mask, all (N, H, W) at pred resolution."""
        pred_text = preds[..., 0].astype(jnp.float32)
        pred_kernel = preds[..., 1].astype(jnp.float32)
        embed = preds[..., 2:].astype(jnp.float32)
        gt_texts = targets['gt_texts']
        gt_kernels = targets['gt_kernels']
        gt_mask = targets['gt_mask'].astype(jnp.float32)

        N = pred_text.shape[0]
        loss_aggr, loss_discr = self._aggr_discr(
            gt_texts.reshape(N, -1), gt_kernels.reshape(N, -1),
            embed.reshape(N, -1, embed.shape[-1]))

        text_bin = (gt_texts > 0.5).astype(jnp.float32)
        sampled = _ohem_mask(jax.lax.stop_gradient(pred_text), text_bin,
                             gt_mask, self.ohem_ratio)
        loss_text = _dice_loss_with_logits(pred_text, text_bin, sampled)
        kernel_mask = text_bin * gt_mask
        loss_kernel = _dice_loss_with_logits(
            pred_kernel, (gt_kernels > 0.5).astype(jnp.float32), kernel_mask)

        red = jnp.mean if self.reduction == 'mean' else jnp.sum
        return {
            'loss_text': red(loss_text),
            'loss_kernel': self.alpha * red(loss_kernel),
            'loss_aggregation': self.beta * red(loss_aggr),
            'loss_discrimination': self.beta * red(loss_discr),
        }


@LOSSES.register_module()
class PSELoss:
    """Reference losses/pse_loss.py: OHEM text dice + mean per-kernel dice."""

    def __init__(self, alpha=0.7, ohem_ratio=3, reduction='mean',
                 kernel_sample_type='adaptive', **kwargs):
        self.alpha = alpha
        self.ohem_ratio = ohem_ratio
        self.reduction = reduction
        self.kernel_sample_type = kernel_sample_type

    def __call__(self, preds, targets):
        """preds: (N, H, W, K+1) raw logits (text + K kernels); targets:
        gt_kernels (N, K+1, H, W) binary (level 0 = full text), gt_mask."""
        pred_text = preds[..., 0].astype(jnp.float32)
        gt_kernels = targets['gt_kernels'].astype(jnp.float32)
        gt_mask = targets['gt_mask'].astype(jnp.float32)

        sampled = _ohem_mask(jax.lax.stop_gradient(pred_text),
                             gt_kernels[:, 0], gt_mask, self.ohem_ratio)
        loss_text = _dice_loss_with_logits(pred_text, gt_kernels[:, 0],
                                           sampled)
        if self.kernel_sample_type == 'hard':
            k_mask = (gt_kernels[:, 0] > 0.5).astype(jnp.float32) * gt_mask
        else:  # adaptive (pse_loss.py:82-84)
            k_mask = (pred_text > 0).astype(jnp.float32) * gt_mask
        num_kernel = preds.shape[-1] - 1
        loss_k = 0.
        for i in range(num_kernel):
            loss_k = loss_k + _dice_loss_with_logits(
                preds[..., 1 + i].astype(jnp.float32), gt_kernels[:, 1 + i],
                k_mask)
        loss_k = loss_k / num_kernel
        red = jnp.mean if self.reduction == 'mean' else jnp.sum
        return {
            'loss_text': self.alpha * red(loss_text),
            'loss_kernel': (1 - self.alpha) * red(loss_k),
        }


class PANetModule(nn.Module):
    """backbone -> FPEM_FFM/FPNF -> PANHead (reference detectors/panet.py and
    psenet.py are SingleStageTextDetector tag classes)."""
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    def __call__(self, img, train: bool = False):
        feats = self.backbone(img, train=train)
        x = self.neck(feats, train=train)
        return self.head(x, train=train)
