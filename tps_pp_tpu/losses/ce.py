"""Cross-entropy recognition losses (CELoss / SARLoss / TFLoss).

Shift/ignore semantics match reference ``losses/ce_loss.py``:
  * CELoss — optional ignore_first_char (ce_loss.py:36-45).
  * SARLoss — target[:,1:] vs output[:,:-1], reduction mean (ce_loss.py:86-96).
  * TFLoss — same shift, flatten (ce_loss.py:124-134).
All are stateless pure functions over logits. Reduction semantics match the
reference *end to end*: with ``reduction='none'`` (CELoss/TFLoss defaults)
the per-position loss vector is later averaged over ALL positions by
``_parse_losses`` (reference recognizer/base.py:96-129) — ignored pads
contribute 0 to the numerator but count in the denominator; with
``reduction='mean'`` (SARLoss) torch CrossEntropyLoss averages over
non-ignored positions only. Getting this wrong rescales the loss ~2-4x on
pad-heavy batches and silently changes the effective LR of the reference
schedules in configs/.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..registry import LOSSES


def _masked_ce(logits, targets, ignore_index: int, reduction: str = 'none'):
    """CE with ignore_index. logits (..., C), targets (...).

    reduction='mean' averages over non-ignored positions (torch
    CrossEntropyLoss); 'none' averages over ALL positions, reproducing the
    reference pipeline where the 'none' vector is mean()-ed by
    _parse_losses (recognizer/base.py:107-110).
    """
    assert reduction in ('none', 'mean', 'sum'), reduction
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(targets, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = (targets != ignore_index).astype(jnp.float32)
    if reduction == 'mean':
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    if reduction == 'sum':
        return jnp.sum(nll * mask)
    return jnp.sum(nll * mask) / targets.size


@LOSSES.register_module()
class CELoss:
    def __init__(self, ignore_index=-1, reduction='none',
                 ignore_first_char=False, **kwargs):
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.ignore_first_char = ignore_first_char

    def format(self, outputs, targets):
        if self.ignore_first_char:
            targets = targets[:, 1:]
            outputs = outputs[:, :-1, :]
        return outputs, targets

    def __call__(self, outputs, targets_dict, valid_ratio=None
                 ) -> Dict[str, jax.Array]:
        outputs, targets = self.format(outputs,
                                       targets_dict['padded_targets'])
        return {'loss_ce': _masked_ce(outputs, targets, self.ignore_index,
                                      self.reduction)}


@LOSSES.register_module()
class SARLoss(CELoss):
    def __init__(self, ignore_index=0, reduction='mean', **kwargs):
        super().__init__(ignore_index, reduction)

    def format(self, outputs, targets):
        return outputs[:, :-1, :], targets[:, 1:]

    def __call__(self, outputs, targets_dict, valid_ratio=None):
        outputs, targets = self.format(outputs,
                                       targets_dict['padded_targets'])
        return {'loss_ce': _masked_ce(outputs, targets, self.ignore_index,
                                      self.reduction)}


@LOSSES.register_module()
class TFLoss(CELoss):
    def __init__(self, ignore_index=-1, reduction='none', flatten=True,
                 **kwargs):
        super().__init__(ignore_index, reduction)
        self.flatten = flatten

    def format(self, outputs, targets):
        return outputs[:, :-1, :], targets[:, 1:]

    def __call__(self, outputs, targets_dict, valid_ratio=None):
        outputs, targets = self.format(outputs,
                                       targets_dict['padded_targets'])
        return {'loss_ce': _masked_ce(outputs, targets, self.ignore_index,
                                      self.reduction)}
