"""ABINet multi-branch loss (reference ``losses/mix_loss.py:10-119``).

The reference flattens each sample's logits to its true target length before
CE. TPU version: masked CE with mask = (pos < target_length) — identical
numerator/denominator (the reference's mean over flattened positions equals
the masked sum / mask count), static shapes.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..registry import LOSSES


def _masked_ce_by_length(logits, targets, lengths, num_classes):
    """logits (N,T,C), targets (N,T), lengths (N,)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(targets, 0, num_classes - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = (jnp.arange(targets.shape[1])[None, :] <
            lengths[:, None]).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


@LOSSES.register_module()
class ABILoss:
    def __init__(self, enc_weight=1.0, dec_weight=1.0, fusion_weight=1.0,
                 num_classes=37, **kwargs):
        self.enc_weight = float(enc_weight)
        self.dec_weight = float(dec_weight)
        self.fusion_weight = float(fusion_weight)
        self.num_classes = num_classes

    def __call__(self, outputs: Dict, targets_dict: Dict,
                 valid_ratio=None) -> Dict:
        targets = targets_dict['padded_targets']
        lengths = targets_dict['target_lengths']
        losses = {}
        if outputs.get('out_enc') is not None:
            losses['loss_visual'] = self.enc_weight * _masked_ce_by_length(
                outputs['out_enc']['logits'], targets, lengths,
                self.num_classes)
        if outputs.get('out_decs'):
            dec = [_masked_ce_by_length(o['logits'], targets, lengths,
                                        self.num_classes)
                   for o in outputs['out_decs']]
            losses['loss_lang'] = self.dec_weight * sum(dec) / len(dec)
        if outputs.get('out_fusers'):
            fus = [_masked_ce_by_length(o['logits'], targets, lengths,
                                        self.num_classes)
                   for o in outputs['out_fusers']]
            losses['loss_fusion'] = self.fusion_weight * sum(fus) / len(fus)
        return losses
