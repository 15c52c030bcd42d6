"""DBNet post-processing + text-detection hmean-IoU metric (host-side).

* ``DBPostprocessor`` — reference ``textdet/postprocess/db_postprocessor.py``:
  binarize the prob map, extract contours, score-filter, unclip. pyclipper
  isn't available, so unclipping dilates the component mask by the DB offset
  distance (same A*r'/L geometry) and re-extracts the contour.
* ``eval_hmean_iou`` — reference ``core/evaluation/hmean_iou.py`` protocol
  (IoU>=0.5 one-to-one matching); polygon IoU computed by rasterization
  (shapely-free).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import cv2
import numpy as np


class DBPostprocessor:
    def __init__(self, text_repr_type='quad', mask_thr=0.3, min_text_score=0.3,
                 min_text_width=5, unclip_ratio=1.5, max_candidates=3000,
                 **kwargs):
        self.text_repr_type = text_repr_type
        self.mask_thr = mask_thr
        self.min_text_score = min_text_score
        self.min_text_width = min_text_width
        self.unclip_ratio = unclip_ratio
        self.max_candidates = max_candidates

    def __call__(self, prob_map: np.ndarray) -> List[np.ndarray]:
        """prob_map: (H, W) float in [0,1]. Returns a list of polygons
        [x1,y1,...,score]."""
        prob_map = np.asarray(prob_map, np.float32)
        mask = (prob_map > self.mask_thr).astype(np.uint8)
        contours, _ = cv2.findContours(mask, cv2.RETR_LIST,
                                       cv2.CHAIN_APPROX_SIMPLE)
        boundaries = []
        for contour in contours[:self.max_candidates]:
            if len(contour) < 3:
                continue
            comp = np.zeros_like(mask)
            cv2.drawContours(comp, [contour], -1, 1, -1)
            score = float((prob_map * comp).sum() / max(comp.sum(), 1))
            if score < self.min_text_score:
                continue
            area = cv2.contourArea(contour)
            length = cv2.arcLength(contour, True)
            d = int(round(area * self.unclip_ratio / max(length, 1.0)))
            if d > 0:
                kernel = cv2.getStructuringElement(
                    cv2.MORPH_ELLIPSE, (2 * d + 1, 2 * d + 1))
                comp = cv2.dilate(comp, kernel)
                cs, _ = cv2.findContours(comp, cv2.RETR_EXTERNAL,
                                         cv2.CHAIN_APPROX_SIMPLE)
                if not cs:
                    continue
                contour = max(cs, key=cv2.contourArea)
            if self.text_repr_type == 'quad':
                rect = cv2.minAreaRect(contour)
                if min(rect[1]) < self.min_text_width:
                    continue
                points = cv2.boxPoints(rect)
            else:
                points = contour.reshape(-1, 2)
                if len(points) < 4:
                    continue
            boundaries.append(
                np.concatenate([points.reshape(-1), [score]]).astype(
                    np.float32))
        return boundaries


def _poly_iou(a: np.ndarray, b: np.ndarray, scale: int = 1) -> float:
    """Rasterized polygon IoU (shapely-free)."""
    pa = np.asarray(a, np.float32).reshape(-1, 2)
    pb = np.asarray(b, np.float32).reshape(-1, 2)
    all_pts = np.concatenate([pa, pb], axis=0)
    mins = all_pts.min(0)
    maxs = all_pts.max(0)
    wh = np.maximum((maxs - mins + 2).astype(np.int32), 1)
    if wh[0] * wh[1] > 4_000_000:  # guard
        scale = max(scale, int(np.sqrt(wh[0] * wh[1] / 4_000_000)) + 1)
    w, h = int(wh[0] // scale) + 1, int(wh[1] // scale) + 1
    ma = np.zeros((h, w), np.uint8)
    mb = np.zeros((h, w), np.uint8)
    cv2.fillPoly(ma, [((pa - mins) / scale).astype(np.int32)], 1)
    cv2.fillPoly(mb, [((pb - mins) / scale).astype(np.int32)], 1)
    inter = np.logical_and(ma, mb).sum()
    union = np.logical_or(ma, mb).sum()
    return float(inter) / max(float(union), 1.0)


def eval_hmean_iou(pred_boundaries: Sequence[Sequence[np.ndarray]],
                   gt_polygons: Sequence[Sequence[np.ndarray]],
                   iou_thr: float = 0.5) -> Dict[str, float]:
    """Per-image one-to-one IoU matching -> dataset precision/recall/hmean
    (reference hmean_iou protocol)."""
    n_gt = n_pred = n_match = 0
    for preds, gts in zip(pred_boundaries, gt_polygons):
        # boundaries may carry a trailing score (odd length) — strip it
        preds = [np.asarray(p, np.float32).reshape(-1) for p in preds]
        preds = [p[:-1] if len(p) % 2 else p for p in preds]
        n_gt += len(gts)
        n_pred += len(preds)
        used = set()
        for g in gts:
            best, best_j = 0.0, -1
            for j, p in enumerate(preds):
                if j in used:
                    continue
                iou = _poly_iou(np.asarray(p, np.float32).reshape(-1, 2),
                                np.asarray(g, np.float32).reshape(-1, 2))
                if iou > best:
                    best, best_j = iou, j
            if best >= iou_thr:
                n_match += 1
                used.add(best_j)
    eps = 1e-8
    precision = n_match / (n_pred + eps)
    recall = n_match / (n_gt + eps)
    hmean = 2 * precision * recall / (precision + recall + eps)
    return {'precision': round(precision, 4), 'recall': round(recall, 4),
            'hmean': round(hmean, 4)}
