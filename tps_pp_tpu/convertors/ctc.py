"""CTC codec: <BLK> at index 0, optional trailing <UKN>.

Matches the reference ``convertors/ctc.py:41-56`` token layout and the greedy
collapse in ``tensor2idx`` (ctc.py:86-145) including valid_ratio-clipped
decode length (decode_len = ceil(T * valid_ratio), ctc.py:119-126).
``str2tensor`` additionally emits fixed-shape padded targets for the TPU CTC
loss (optax.ctc_loss wants dense (N, L) labels, not the flattened form torch's
CTCLoss takes at reference ctc_loss.py:58-84).
"""
from __future__ import annotations

import math
from typing import List

import numpy as np

from ..registry import CONVERTORS
from .base import BaseConvertor


@CONVERTORS.register_module()
class CTCConvertor(BaseConvertor):

    def __init__(self,
                 dict_type='DICT90',
                 dict_file=None,
                 dict_list=None,
                 with_unknown=True,
                 lower=False,
                 max_seq_len=40,
                 **kwargs):
        super().__init__(dict_type, dict_file, dict_list)
        self.with_unknown = bool(with_unknown)
        self.lower = bool(lower)
        self.max_seq_len = int(max_seq_len)
        self.update_dict()

    def update_dict(self):
        self.blank_idx = 0
        self.idx2char.insert(0, '<BLK>')
        self.unknown_idx = None
        if self.with_unknown:
            self.idx2char.append('<UKN>')
            self.unknown_idx = len(self.idx2char) - 1
        self._rebuild_char2idx()

    def str2tensor(self, strings: List[str]):
        indexes = self.str2idx(strings)
        target_lengths = np.asarray([len(x) for x in indexes], dtype=np.int32)
        # each label clamped to max_seq_len so the field stays consistent
        # with the clipped target_lengths below (torch flatten=True pairing)
        flatten = (np.concatenate([
            np.asarray(x, dtype=np.int32)[:self.max_seq_len]
            for x in indexes])
            if indexes and any(len(x) for x in indexes)
            else np.zeros((0,), dtype=np.int32))
        # dense (N, L) labels padded with 0 (= blank, ignored via lengths)
        padded = np.zeros((len(strings), self.max_seq_len), dtype=np.int32)
        for i, index in enumerate(indexes):
            n = min(len(index), self.max_seq_len)
            padded[i, :n] = index[:n]
        return {
            'targets': [np.asarray(x, dtype=np.int32) for x in indexes],
            'flatten_targets': flatten,
            'target_lengths': np.minimum(target_lengths, self.max_seq_len),
            'padded_targets': padded,
        }

    def tensor2idx(self, output, img_metas=None, topk=1, return_topk=False):
        """output: (N, T, C) raw logits; applies softmax like the reference."""
        output = np.asarray(output, dtype=np.float64)
        output = np.exp(output - output.max(-1, keepdims=True))
        output = output / output.sum(-1, keepdims=True)

        valid_ratios = [1.0] * output.shape[0]
        if img_metas is not None:
            valid_ratios = [m.get('valid_ratio', 1.0) for m in img_metas]

        feat_len = output.shape[1]
        topk_idx = np.argsort(-output, axis=-1)[..., :topk]
        topk_value = np.take_along_axis(output, topk_idx, axis=-1)
        indexes, scores = [], []
        indexes_topk, scores_topk = [], []
        for b in range(output.shape[0]):
            decode_len = min(feat_len,
                             math.ceil(feat_len * valid_ratios[b]))
            pred = topk_idx[b, :, 0]
            select = []
            prev = self.blank_idx
            for t in range(decode_len):
                v = int(pred[t])
                if v not in (prev, self.blank_idx):
                    select.append(t)
                prev = v
            idx_list = topk_idx[b, select, :].tolist()
            val_list = topk_value[b, select, :].tolist()
            indexes_topk.append(idx_list)
            scores_topk.append(val_list)
            indexes.append([x[0] for x in idx_list])
            scores.append([x[0] for x in val_list])
        if return_topk:
            return indexes_topk, scores_topk
        return indexes, scores
