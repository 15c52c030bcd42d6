"""Masked-target codec variants (the fork's masked-training experiments).

Reference ``convertors/maskctc.py`` (MaskCTCConvertor) and ``mask_abi.py``:
selected character positions are replaced with <UKN> to form
(masked, complement) target pairs — the downstream Mask* models were deleted
from the reference (SURVEY §2.11), but the codecs themselves are functional
and kept for config compatibility.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..registry import CONVERTORS
from .attn import AttnConvertor
from .ctc import CTCConvertor


def _mask_pair(index: np.ndarray, mask_ids: Sequence[int], unknown: int):
    """(masked, complement): masked has <UKN> at mask positions, complement
    has <UKN> everywhere else (reference maskctc.py mask_id_gen). Out-of-
    range ids (the reference indexes torch tensors, which would error the
    pipeline) are dropped."""
    sel = np.zeros(len(index), bool)
    ids = np.asarray(list(mask_ids), int)
    ids = ids[(ids >= 0) & (ids < len(index))]
    sel[ids] = True
    masked = np.where(sel, unknown, index).astype(np.int32)
    other = np.where(~sel, unknown, index).astype(np.int32)
    return masked, other


@CONVERTORS.register_module()
class MaskCTCConvertor(CTCConvertor):

    def mask_id_gen(self, mask_ids, targets):
        pairs = [_mask_pair(t, m, self.unknown_idx)
                 for t, m in zip(targets, mask_ids)]
        return [p[0] for p in pairs], [p[1] for p in pairs]

    def str2tensor_mask(self, strings: List[str], mask_ids):
        out = self.str2tensor(strings)
        masked, other = self.mask_id_gen(mask_ids, out['targets'])
        out['masked_targets'] = masked
        out['other_targets'] = other
        return out


@CONVERTORS.register_module()
class Mask_ABIConvertor(AttnConvertor):
    """reference convertors/mask_abi.py — AttnConvertor with masked pairs."""

    def str2tensor_mask(self, strings: List[str], mask_ids):
        out = self.str2tensor(strings)
        # the reference masks the ABI-shaped tensors — truncated to
        # max_seq_len-1 and EOS-terminated (mask_abi.py:51-52) — not the
        # raw char indexes, so pair lengths line up with its mask ids
        tensors = [np.concatenate([
            np.asarray(t, np.int32)[:self.max_seq_len - 1],
            [self.end_idx]]) for t in out['targets']]
        pairs = [_mask_pair(t, m, self.unknown_idx)
                 for t, m in zip(tensors, mask_ids)]
        out['masked_targets'] = [p[0] for p in pairs]
        out['other_targets'] = [p[1] for p in pairs]
        return out
