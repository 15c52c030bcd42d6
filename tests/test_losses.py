"""CE-family losses vs the reference's end-to-end reduction.

TFLoss/CELoss run torch CrossEntropyLoss with reduction='none'; the runner
then mean()s the per-position vector over ALL positions
(recognizer/base.py:107-110) — so the torch reference here is
reduction='none' followed by .mean(). SARLoss uses reduction='mean'
(over non-ignored positions only).
"""
import numpy as np
import torch

from tps_pp_tpu.losses import TFLoss, SARLoss


def _torch_tf_loss(logits, targets, ignore_index, reduction='none'):
    out = torch.from_numpy(logits[:, :-1, :]).reshape(-1, logits.shape[-1])
    tgt = torch.from_numpy(targets[:, 1:].astype(np.int64)).reshape(-1)
    loss = torch.nn.CrossEntropyLoss(ignore_index=ignore_index,
                                     reduction=reduction)(out, tgt)
    return float(loss.mean())


def test_tf_loss_matches_torch():
    rng = np.random.default_rng(0)
    N, T, C = 4, 9, 11
    pad = 10
    logits = rng.standard_normal((N, T, C)).astype(np.float32)
    targets = rng.integers(0, C - 1, size=(N, T)).astype(np.int32)
    targets[:, -3:] = pad
    ours = float(TFLoss(ignore_index=pad)(
        logits, {'padded_targets': targets})['loss_ce'])
    ref = _torch_tf_loss(logits, targets, pad, reduction='none')
    assert abs(ours - ref) < 1e-4


def test_sar_loss_matches_torch():
    rng = np.random.default_rng(1)
    N, T, C = 3, 7, 9
    pad = 8
    logits = rng.standard_normal((N, T, C)).astype(np.float32)
    targets = rng.integers(0, C - 1, size=(N, T)).astype(np.int32)
    targets[:, -2:] = pad
    ours = float(SARLoss(ignore_index=pad)(
        logits, {'padded_targets': targets})['loss_ce'])
    ref = _torch_tf_loss(logits, targets, pad, reduction='mean')
    assert abs(ours - ref) < 1e-4
