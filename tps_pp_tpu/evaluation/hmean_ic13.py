"""ICDAR-2013 style detection hmean (reference
``core/evaluation/hmean_ic13.py:1-217``): one-to-one, one-to-many and
many-to-one matching with recall/precision thresholds (0.8 / 0.4) and a 0.8
score for the *-to-many cases. Area overlaps computed by rasterization
(shapely-free, like evaluation/hmean-IoU here)."""
from __future__ import annotations

from typing import Dict, List, Sequence

import cv2
import numpy as np


def _rasterize(polys, shape):
    masks = []
    for p in polys:
        m = np.zeros(shape, np.uint8)
        cv2.fillPoly(m, [np.asarray(p, np.float32).reshape(-1, 2).astype(
            np.int32)], 1)
        masks.append(m)
    return masks


def eval_hmean_ic13(pred_boundaries: Sequence[Sequence],
                    gt_polygons: Sequence[Sequence],
                    precision_thr: float = 0.4, recall_thr: float = 0.8,
                    gt_ignore=None, ignore_thr: float = 0.5
                    ) -> Dict[str, float]:
    """``gt_ignore``: per-image don't-care polygons — predictions mostly
    covered by one are discarded before precision, like the reference
    (which filters dets via ignored-gt intersection)."""
    accum_recall = 0.0
    accum_precision = 0.0
    n_gt = n_pred = 0
    if gt_ignore is None:
        gt_ignore = [[] for _ in pred_boundaries]
    for preds, gts, ignores in zip(pred_boundaries, gt_polygons, gt_ignore):
        preds = [np.asarray(p, np.float32).reshape(-1) for p in preds]
        preds = [p[:-1] if len(p) % 2 else p for p in preds]
        if len(ignores):
            from ..models.textdet.postprocess import _ignore_ratio
            preds = [p for p in preds
                     if max((_ignore_ratio(p, ig) for ig in ignores),
                            default=0.0) < ignore_thr]
        n_gt += len(gts)
        n_pred += len(preds)
        if not gts or not preds:
            continue
        all_pts = np.concatenate(
            [np.asarray(p, np.float32).reshape(-1, 2) for p in
             list(gts) + list(preds)])
        h = int(all_pts[:, 1].max()) + 2
        w = int(all_pts[:, 0].max()) + 2
        gm = _rasterize(gts, (h, w))
        pm = _rasterize(preds, (h, w))
        g_area = np.asarray([m.sum() for m in gm], np.float64)
        p_area = np.asarray([m.sum() for m in pm], np.float64)
        inter = np.zeros((len(gm), len(pm)))
        for i, g in enumerate(gm):
            for j, p in enumerate(pm):
                inter[i, j] = np.logical_and(g, p).sum()
        recall_mat = inter / np.maximum(g_area[:, None], 1)
        prec_mat = inter / np.maximum(p_area[None, :], 1)

        gt_hit = np.zeros(len(gm), bool)
        pred_hit = np.zeros(len(pm), bool)
        # one-to-one: the IC13 protocol requires UNIQUENESS — exactly one
        # qualifying det in the gt's row AND one qualifying gt in the
        # det's column (reference one2one_match_ic13, utils.py:262-305;
        # strict > comparisons). A gt covered by two near-duplicate dets
        # is NOT a one-to-one match; it falls through to one-to-many.
        qual = (recall_mat > recall_thr) & (prec_mat > precision_thr)
        row_cnt = qual.sum(axis=1)
        col_cnt = qual.sum(axis=0)
        for i in range(len(gm)):
            for j in range(len(pm)):
                if (qual[i, j] and row_cnt[i] == 1 and col_cnt[j] == 1 and
                        not gt_hit[i] and not pred_hit[j]):
                    gt_hit[i] = pred_hit[j] = True
                    accum_recall += 1.0
                    accum_precision += 1.0
        # one gt -> many preds
        for i in range(len(gm)):
            if gt_hit[i]:
                continue
            js = [j for j in range(len(pm)) if not pred_hit[j] and
                  prec_mat[i, j] >= precision_thr]
            if len(js) >= 2 and recall_mat[i, js].sum() >= recall_thr:
                gt_hit[i] = True
                for j in js:
                    pred_hit[j] = True
                accum_recall += 0.8
                accum_precision += 0.8 * len(js)
        # many gts -> one pred
        for j in range(len(pm)):
            if pred_hit[j]:
                continue
            is_ = [i for i in range(len(gm)) if not gt_hit[i] and
                   recall_mat[i, j] >= recall_thr]
            if len(is_) >= 2 and prec_mat[is_, j].sum() >= precision_thr:
                pred_hit[j] = True
                for i in is_:
                    gt_hit[i] = True
                accum_recall += 0.8 * len(is_)
                accum_precision += 0.8
    eps = 1e-8
    recall = accum_recall / (n_gt + eps)
    precision = accum_precision / (n_pred + eps)
    hmean = 2 * precision * recall / (precision + recall + eps)
    return {'precision': round(precision, 4), 'recall': round(recall, 4),
            'hmean': round(hmean, 4)}
