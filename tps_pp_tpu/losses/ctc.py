"""CTC loss on TPU via optax's log-semiring implementation.

Replaces the reference's cuDNN/ATen ``nn.CTCLoss`` wrapper
(``losses/ctc_loss.py:11-107``). optax.ctc_loss wants dense padded labels +
logit/label padding masks instead of torch's flattened form; the convertor
emits both. Validated against torch.nn.CTCLoss in tests.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..registry import LOSSES


@LOSSES.register_module()
class CTCLoss:
    def __init__(self, flatten=True, blank=0, reduction='mean',
                 zero_infinity=False, **kwargs):
        self.blank = blank
        self.reduction = reduction
        self.zero_infinity = zero_infinity

    def __call__(self, outputs, targets_dict, valid_ratio=None
                 ) -> Dict[str, jax.Array]:
        """outputs: (N, T, C) raw logits; targets_dict with 'padded_targets'
        (N, L) and 'target_lengths' (N,)."""
        N, T, _ = outputs.shape
        labels = targets_dict['padded_targets']
        # keep zero-length targets: a fully label-padded row makes optax
        # score the all-blank alignment, matching torch nn.CTCLoss's
        # empty-transcript semantics (clipping to 1 would instead feed
        # blank as a real label — a different, degenerate loss)
        lengths = jnp.clip(targets_dict['target_lengths'], 0, labels.shape[1])
        logit_pad = jnp.zeros((N, T), dtype=jnp.float32)
        label_pad = (jnp.arange(labels.shape[1])[None, :] >=
                     lengths[:, None]).astype(jnp.float32)
        per_seq = optax.ctc_loss(outputs.astype(jnp.float32), logit_pad,
                                 labels, label_pad, blank_id=self.blank)
        if self.zero_infinity:
            per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
        if self.reduction == 'mean':
            # torch 'mean' divides each sequence loss by its target length
            # (clamped to 1 for empty transcripts), then batch-averages
            loss = jnp.mean(per_seq /
                            jnp.maximum(lengths, 1).astype(jnp.float32))
        elif self.reduction == 'sum':
            loss = jnp.sum(per_seq)
        else:
            loss = per_seq
        return {'loss_ctc': loss}
