"""optax CTC vs torch.nn.CTCLoss (the reference's native loss,
ctc_loss.py:39-40) on random cases."""
import numpy as np
import torch

from tps_pp_tpu.losses import CTCLoss


def test_ctc_matches_torch():
    rng = np.random.default_rng(0)
    N, T, C = 3, 12, 8
    logits = rng.standard_normal((N, T, C)).astype(np.float32)
    lengths = np.array([4, 2, 5], np.int32)
    labels = np.zeros((N, 6), np.int32)
    for i, L in enumerate(lengths):
        labels[i, :L] = rng.integers(1, C, size=L)

    loss = CTCLoss(reduction='mean')
    out = loss(logits, {'padded_targets': labels, 'target_lengths': lengths})
    ours = float(out['loss_ctc'])

    t_logp = torch.log_softmax(torch.from_numpy(logits), dim=2).permute(1, 0, 2)
    flat = np.concatenate([labels[i, :lengths[i]] for i in range(N)])
    ref = torch.nn.CTCLoss(blank=0, reduction='mean')(
        t_logp, torch.from_numpy(flat.astype(np.int64)),
        torch.full((N,), T, dtype=torch.long),
        torch.from_numpy(lengths.astype(np.int64)))
    assert abs(ours - float(ref)) < 1e-3


def test_ctc_sum_reduction():
    rng = np.random.default_rng(1)
    N, T, C = 2, 10, 6
    logits = rng.standard_normal((N, T, C)).astype(np.float32)
    lengths = np.array([3, 4], np.int32)
    labels = np.zeros((N, 5), np.int32)
    for i, L in enumerate(lengths):
        labels[i, :L] = rng.integers(1, C, size=L)
    out = CTCLoss(reduction='sum')(
        logits, {'padded_targets': labels, 'target_lengths': lengths})
    t_logp = torch.log_softmax(torch.from_numpy(logits), dim=2).permute(1, 0, 2)
    flat = np.concatenate([labels[i, :lengths[i]] for i in range(N)])
    ref = torch.nn.CTCLoss(blank=0, reduction='sum')(
        t_logp, torch.from_numpy(flat.astype(np.int64)),
        torch.full((N,), T, dtype=torch.long),
        torch.from_numpy(lengths.astype(np.int64)))
    np.testing.assert_allclose(float(out['loss_ctc']), float(ref), rtol=1e-3)


def test_ctc_empty_transcript_matches_torch():
    """Zero-length targets must score the all-blank alignment like torch
    (ADVICE r1: clipping length to 1 fed blank as a real label)."""
    rng = np.random.default_rng(2)
    N, T, C = 4, 12, 8
    logits = rng.standard_normal((N, T, C)).astype(np.float32)
    lengths = np.array([6, 3, 0, 1], np.int32)
    labels = np.zeros((N, 6), np.int32)
    for i, L in enumerate(lengths):
        labels[i, :L] = rng.integers(1, C, size=L)
    out = CTCLoss(reduction='mean')(
        logits, {'padded_targets': labels, 'target_lengths': lengths})
    t_logp = torch.log_softmax(torch.from_numpy(logits), dim=2).permute(1, 0, 2)
    flat = np.concatenate([labels[i, :lengths[i]] for i in range(N)])
    ref = torch.nn.CTCLoss(blank=0, reduction='mean')(
        t_logp, torch.from_numpy(flat.astype(np.int64)),
        torch.full((N,), T, dtype=torch.long),
        torch.from_numpy(lengths.astype(np.int64)))
    np.testing.assert_allclose(float(out['loss_ctc']), float(ref), rtol=1e-4)
