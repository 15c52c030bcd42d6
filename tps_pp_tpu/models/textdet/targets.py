"""DBNet ground-truth generation (host-side).

Counterpart of reference ``datasets/pipelines/textdet_targets/
dbnet_targets.py``, which shrinks/dilates polygons with pyclipper. pyclipper
is not available here, so maps are built with distance transforms — the same
geometry (offset distance d = A(1-r^2)/L per the DB paper) computed on
rasterized masks:

  * gt_shrink: polygon mask eroded by d (prob-map target)
  * gt_thr:    normalized distance-to-boundary ramp in the band
               [polygon eroded by d, polygon dilated by d], in
               [thr_min, thr_max] (threshold-map target)
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import cv2
import numpy as np

from ...registry import PIPELINES


def _poly_mask(poly: np.ndarray, h: int, w: int) -> np.ndarray:
    mask = np.zeros((h, w), np.uint8)
    cv2.fillPoly(mask, [poly.astype(np.int32).reshape(-1, 2)], 1)
    return mask


def _offset_distance(poly: np.ndarray, shrink_ratio: float) -> float:
    area = cv2.contourArea(poly.astype(np.float32).reshape(-1, 2))
    length = cv2.arcLength(poly.astype(np.float32).reshape(-1, 2), True)
    return area * (1 - shrink_ratio ** 2) / max(length, 1.0)


@PIPELINES.register_module()
class DBNetTargets:
    def __init__(self, shrink_ratio=0.4, thr_min=0.3, thr_max=0.7,
                 min_short_size=8):
        self.shrink_ratio = shrink_ratio
        self.thr_min = thr_min
        self.thr_max = thr_max
        self.min_short_size = min_short_size

    def generate(self, polygons: Sequence[np.ndarray], h: int,
                 w: int) -> Dict[str, np.ndarray]:
        gt_shrink = np.zeros((h, w), np.float32)
        gt_shrink_mask = np.ones((h, w), np.float32)
        gt_thr = np.zeros((h, w), np.float32)
        gt_thr_mask = np.zeros((h, w), np.float32)

        for poly in polygons:
            poly = np.asarray(poly, np.float32).reshape(-1, 2)
            rect = cv2.minAreaRect(poly)
            short_side = min(rect[1])
            mask = _poly_mask(poly, h, w)
            if short_side < self.min_short_size:
                gt_shrink_mask[mask > 0] = 0  # ignore tiny instances
                continue
            d = max(int(round(_offset_distance(poly, self.shrink_ratio))), 1)
            # distance transform inside/outside the polygon
            inside = cv2.distanceTransform(mask, cv2.DIST_L2, 3)
            outside = cv2.distanceTransform(1 - mask, cv2.DIST_L2, 3)
            signed = np.where(mask > 0, inside, -outside)
            gt_shrink[signed >= d] = 1.0
            band = np.abs(signed) < d
            gt_thr_mask[band] = 1.0
            ramp = np.clip(1.0 - np.abs(signed) / d, 0, 1)
            thr_val = self.thr_min + (self.thr_max - self.thr_min) * ramp
            gt_thr = np.where(band, np.maximum(gt_thr, thr_val), gt_thr)

        return {
            'gt_shrink': gt_shrink,
            'gt_shrink_mask': gt_shrink_mask,
            'gt_thr': gt_thr,
            'gt_thr_mask': gt_thr_mask,
        }

    def __call__(self, results: Dict) -> Dict:
        h, w = results['img'].shape[:2]
        polygons = results.get('gt_polygons', [])
        results.update(self.generate(polygons, h, w))
        return results


def _shrink_distance(poly: np.ndarray, ratio: float, max_shrink: int) -> int:
    """d = area*(1-r^2)/(peri+1e-3), capped (reference
    base_textdet_targets.py:105-118)."""
    p = poly.astype(np.float32).reshape(-1, 2)
    area = cv2.contourArea(p)
    peri = cv2.arcLength(p, True)
    return min(int(area * (1 - ratio * ratio) / (peri + 0.001) + 0.5),
               max_shrink)


def _shrunk_instance_map(polygons, h, w, ratio, max_shrink):
    """Instance-labeled kernel map for one shrink ratio: each polygon eroded
    by its offset distance and filled with (index+1) — the pyclipper-free
    counterpart of reference generate_kernels (base_textdet_targets.py:89-137)
    built from distance transforms."""
    kernel = np.zeros((h, w), np.float32)
    for ind, poly in enumerate(polygons):
        poly = np.asarray(poly, np.float32).reshape(-1, 2)
        d = _shrink_distance(poly, ratio, max_shrink)
        mask = _poly_mask(poly, h, w)
        if d <= 0:
            kernel[mask > 0] = ind + 1
            continue
        inside = cv2.distanceTransform(mask, cv2.DIST_L2, 3)
        shrunk = inside >= d
        if not shrunk.any():
            continue  # over-shrunk instance is skipped like the reference
        kernel[shrunk] = ind + 1
    return kernel


@PIPELINES.register_module()
class PANetTargets:
    """PANet gt generation (reference textdet_targets/panet_targets.py):
    instance-labeled kernels at shrink ratios (1.0, 0.5) + effective mask."""

    def __init__(self, shrink_ratio=(1.0, 0.5), max_shrink=20):
        self.shrink_ratio = shrink_ratio
        self.max_shrink = max_shrink

    def generate(self, polygons, polygons_ignore, h, w):
        gt_kernels = [
            _shrunk_instance_map(polygons, h, w, r, self.max_shrink)
            for r in self.shrink_ratio
        ]
        gt_mask = np.ones((h, w), np.float32)
        for poly in polygons_ignore:
            cv2.fillPoly(gt_mask,
                         [np.asarray(poly, np.float32).astype(
                             np.int32).reshape(-1, 2)], 0)
        return gt_kernels, gt_mask

    def __call__(self, results: Dict) -> Dict:
        h, w = results['img'].shape[:2]
        kernels, gt_mask = self.generate(
            results.get('gt_polygons', []),
            results.get('gt_polygons_ignore', []), h, w)
        results['gt_texts'] = kernels[0]
        results['gt_kernels'] = kernels[1]
        results['gt_mask'] = gt_mask
        return results


@PIPELINES.register_module()
class PSENetTargets(PANetTargets):
    """PSENet gt generation (reference textdet_targets/psenet_targets.py):
    7 binary kernels at ratios 1.0..0.4 + effective mask. Emits
    'gt_kernels' stacked (K, H, W) binary (the PSELoss layout)."""

    def __init__(self,
                 shrink_ratio=(1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4),
                 max_shrink=20):
        super().__init__(shrink_ratio=shrink_ratio, max_shrink=max_shrink)

    def __call__(self, results: Dict) -> Dict:
        h, w = results['img'].shape[:2]
        kernels, gt_mask = self.generate(
            results.get('gt_polygons', []),
            results.get('gt_polygons_ignore', []), h, w)
        results['gt_kernels'] = np.stack(
            [(k > 0).astype(np.float32) for k in kernels])
        results['gt_mask'] = gt_mask
        return results
