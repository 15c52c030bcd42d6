"""Segmentation-recognition codec (reference ``convertors/seg.py:12-125``):
<BG> at index 0 plus optional trailing <UKN>; decode = per-pixel argmax ->
connected components -> majority-vote char per component, left-to-right by
centroid, area threshold 20.
"""
from __future__ import annotations

from typing import List

import cv2
import numpy as np

from ..registry import CONVERTORS
from .base import BaseConvertor


@CONVERTORS.register_module()
class SegConvertor(BaseConvertor):

    def __init__(self, dict_type='DICT36', dict_file=None, dict_list=None,
                 with_unknown=True, lower=False, **kwargs):
        super().__init__(dict_type, dict_file, dict_list)
        self.with_unknown = bool(with_unknown)
        self.lower = bool(lower)
        self.update_dict()

    def update_dict(self):
        self.idx2char.insert(0, '<BG>')
        self.unknown_idx = None
        if self.with_unknown:
            self.idx2char.append('<UKN>')
            self.unknown_idx = len(self.idx2char) - 1
        self._rebuild_char2idx()

    def tensor2str(self, output, img_metas=None):
        """output: (N, H, W, C) seg logits (NHWC). Returns (texts, scores)."""
        output = np.asarray(output)
        N, H, W, C = output.shape
        texts, scores = [], []
        for b in range(N):
            vr = (img_metas[b].get('valid_ratio', 1.0)
                  if img_metas else 1.0)
            valid_width = int(W * vr + 1)
            seg = output[b, :, :min(valid_width, W)].argmax(-1).astype(
                np.int32)
            thr = np.where(seg == 0, 0, 255).astype(np.uint8)
            ncomp, labels, stats, centroids = \
                cv2.connectedComponentsWithStats(thr)
            all_res = []
            for i in range(ncomp):
                vals = seg[labels == i]
                if vals.size == 0:
                    continue
                counts = np.bincount(vals, minlength=len(self.idx2char))
                cls = int(counts.argmax())
                if cls == 0:
                    continue
                all_res.append((cls, centroids[i][0], int(counts[cls]),
                                counts[cls] / max(vals.size, 1)))
            all_res.sort(key=lambda r: r[1])
            chars, char_scores = [], []
            for cls, _, area, score in all_res:
                if area < 20:
                    continue
                if cls <= 0 or cls >= len(self.idx2char) or \
                        cls == self.unknown_idx:
                    ch = ''
                else:
                    ch = self.idx2char[cls]
                chars.append(ch)
                char_scores.append(float(score))
            texts.append(''.join(chars))
            scores.append(char_scores)
        return texts, scores
