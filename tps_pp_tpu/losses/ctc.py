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

# optax.ctc_loss saturates impossible alignments at log_epsilon = -1e5 and
# returns ~+1e5 (FINITE — torch returns inf there), so torch-style
# zero_infinity must threshold, not isfinite()
_SATURATION_THR = 0.5e5


@LOSSES.register_module()
class CTCLoss:
    def __init__(self, flatten=True, blank=0, reduction='mean',
                 zero_infinity=False, **kwargs):
        self.flatten = flatten
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
        # blank as a real label — a different, degenerate loss). The upper
        # clamp includes T: the reference clamps target_lengths to seq_len
        # (ctc_loss.py:92) — a label longer than the frame count would
        # otherwise be unalignable and saturate the loss at ~1e5.
        lengths = jnp.clip(targets_dict['target_lengths'], 0,
                           min(labels.shape[1], T))
        if not self.flatten and valid_ratio is not None:
            # reference flatten=False semantics: only ceil(valid_ratio * T)
            # frames are real; pad frames are excluded from the alignment
            # (ctc_loss.py:96-101)
            in_len = jnp.ceil(
                jnp.asarray(valid_ratio, jnp.float32) * T).astype(jnp.int32)
            logit_pad = (jnp.arange(T)[None, :] >=
                         in_len[:, None]).astype(jnp.float32)
        else:
            logit_pad = jnp.zeros((N, T), dtype=jnp.float32)
        label_pad = (jnp.arange(labels.shape[1])[None, :] >=
                     lengths[:, None]).astype(jnp.float32)
        per_seq = optax.ctc_loss(outputs.astype(jnp.float32), logit_pad,
                                 labels, label_pad, blank_id=self.blank)
        if self.zero_infinity:
            # torch zeroes unalignable sequences AND their gradients
            per_seq = jnp.where(per_seq < _SATURATION_THR, per_seq, 0.0)
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
