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


def points2boundary(points: np.ndarray, text_repr_type: str,
                    score: float, min_width: int = -1):
    """Point set -> boundary polygon [+score] (reference core/mask.py:8-52)."""
    points = np.asarray(points)
    if text_repr_type == 'quad':
        rect = cv2.minAreaRect(points.astype(np.int32))
        if min(rect[1]) <= min_width:
            return None
        boundary = cv2.boxPoints(rect).flatten().tolist()
    else:  # poly
        height = int(points[:, 1].max()) + 10
        width = int(points[:, 0].max()) + 10
        mask = np.zeros((height, width), np.uint8)
        mask[points[:, 1].astype(int), points[:, 0].astype(int)] = 255
        contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            return None
        boundary = contours[0].flatten().tolist()
    boundary = boundary + [score]
    if len(boundary) < 8 + 1:
        return None
    return np.asarray(boundary, np.float32)


class PSEPostprocessor:
    """Progressive scale expansion decode (reference
    textdet/postprocess/pse_postprocessor.py:13-91) over the first-party
    contour_expand native op."""

    def __init__(self, text_repr_type='poly', min_kernel_confidence=0.5,
                 min_text_avg_confidence=0.85, min_kernel_area=0,
                 min_text_area=16, **kwargs):
        self.text_repr_type = text_repr_type
        self.min_kernel_confidence = min_kernel_confidence
        self.min_text_avg_confidence = min_text_avg_confidence
        self.min_kernel_area = min_kernel_area
        self.min_text_area = min_text_area

    def __call__(self, preds: np.ndarray) -> List[np.ndarray]:
        """preds: (H, W, K+1) raw logits [text, kernels large->small]."""
        from ...native import contour_expand

        preds = 1.0 / (1.0 + np.exp(-np.asarray(preds, np.float32)))
        score = preds[..., 0]
        masks = (preds > self.min_kernel_confidence)
        text_mask = masks[..., 0]
        kernel_masks = (masks * text_mask[..., None]).astype(
            np.uint8).transpose(2, 0, 1)   # (K+1, H, W)
        region_num, labels = cv2.connectedComponents(
            kernel_masks[-1], connectivity=4)
        labels = contour_expand(kernel_masks, labels, self.min_kernel_area,
                                region_num - 1)
        boundaries = []
        for i in range(1, labels.max() + 1):
            points = np.array(np.where(labels == i)).T[:, ::-1]
            area = points.shape[0]
            score_i = float(score[labels == i].mean()) if area else 0.0
            if area < self.min_text_area or \
                    score_i < self.min_text_avg_confidence:
                continue
            vb = points2boundary(points, self.text_repr_type, score_i)
            if vb is not None:
                boundaries.append(vb)
        return boundaries


class PANPostprocessor:
    """Pixel aggregation decode (reference
    textdet/postprocess/pan_postprocessor.py:13-89) over the first-party
    pixel_group native op."""

    def __init__(self, text_repr_type='poly', min_text_confidence=0.5,
                 min_kernel_confidence=0.5, min_text_avg_confidence=0.85,
                 min_text_area=16, **kwargs):
        self.text_repr_type = text_repr_type
        self.min_text_confidence = min_text_confidence
        self.min_kernel_confidence = min_kernel_confidence
        self.min_text_avg_confidence = min_text_avg_confidence
        self.min_text_area = min_text_area

    def __call__(self, preds: np.ndarray) -> List[np.ndarray]:
        """preds: (H, W, 6) raw logits [text, kernel, 4-d embedding]."""
        from ...native import pixel_group

        preds = np.asarray(preds, np.float32)
        text_score = 1.0 / (1.0 + np.exp(-preds[..., 0]))
        kernel_score = 1.0 / (1.0 + np.exp(-preds[..., 1]))
        text = text_score > self.min_text_confidence
        kernel = (kernel_score > self.min_kernel_confidence) & text
        embeddings = preds[..., 2:]

        region_num, labels = cv2.connectedComponents(
            kernel.astype(np.uint8), connectivity=4)
        contours, _ = cv2.findContours((kernel * 255).astype(np.uint8),
                                       cv2.RETR_LIST, cv2.CHAIN_APPROX_NONE)
        kernel_contours = np.zeros(text.shape, dtype=np.uint8)
        cv2.drawContours(kernel_contours, contours, -1, 255)
        text_points = pixel_group(text_score, text, embeddings, labels,
                                  kernel_contours, region_num - 1,
                                  self.min_text_avg_confidence)
        boundaries = []
        for tp in text_points:
            score_i, count = tp[0], tp[1]
            if count < self.min_text_area or \
                    score_i < self.min_text_avg_confidence:
                continue
            points = np.asarray(tp[2:], dtype=int).reshape(-1, 2)
            vb = points2boundary(points, self.text_repr_type, float(score_i))
            if vb is not None:
                boundaries.append(vb)
        return boundaries
