"""Data-side TPS warping augmentations: Stretch / Distort / Curve.

Counterparts of reference ``pipelines/tps_transform.py:22-383`` which warps
images with jittered control points through a TPS solve (torch.solve on a
hardcoded cuda:0 device — a host-side CUDA dependency we deliberately drop,
SURVEY §7.4). Here the TPS system is solved with NumPy on the host and the
warp applied with cv2.remap; same augmentation family (control points on an
image-border grid, x-jitter for Stretch, xy-jitter for Distort, parabolic
vertical displacement for Curve).
"""
from __future__ import annotations

import random
from typing import Dict, List

import cv2
import numpy as np

from ...registry import PIPELINES


def _tps_warp(img: np.ndarray, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Warp img so that dst control points map to src (inverse warp).

    src/dst: (K, 2) pixel coords. Solves the classic TPS system
    (kernel r^2 log r^2, matching the reference's D2*log(D2+eps)) for the
    map dst->src, evaluates it on the full pixel grid, samples with
    cv2.remap."""
    H, W = img.shape[:2]
    K = src.shape[0]
    X = dst.astype(np.float64)          # control points in output space
    Y = src.astype(np.float64)          # where they come from in input space

    eps = 1e-9
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    Kmat = d2 * np.log(d2 + eps)
    P = np.concatenate([np.ones((K, 1)), X], axis=1)
    L = np.zeros((K + 3, K + 3))
    L[:K, :K] = Kmat
    L[:K, K:] = P
    L[K:, :K] = P.T
    Z = np.zeros((K + 3, 2))
    Z[:K] = Y
    Q = np.linalg.solve(L + np.eye(K + 3) * 1e-9, Z)
    Wc, A = Q[:K], Q[K:]

    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    grid = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float64)
    d2g = ((grid[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    U = d2g * np.log(d2g + eps)
    Pg = np.concatenate([np.ones((grid.shape[0], 1)), grid], axis=1)
    mapped = Pg @ A + U @ Wc
    map_x = mapped[:, 0].reshape(H, W).astype(np.float32)
    map_y = mapped[:, 1].reshape(H, W).astype(np.float32)
    out = cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_REPLICATE)
    if out.ndim == 2:
        out = out[:, :, None]
    return out


def _border_grid(W: int, H: int, nx: int = 4) -> List[List[float]]:
    """Control points along top/mid/bottom rows at nx columns."""
    pts = []
    for fx in np.linspace(0, 1, nx):
        x = fx * (W - 1)
        pts += [[x, 0.0], [x, (H - 1) / 2.0], [x, float(H - 1)]]
    return pts


@PIPELINES.register_module()
class Stretch:
    """Horizontal squeeze/stretch via x-jittered column control points
    (reference tps_transform.py Stretch)."""

    def __init__(self, mag=-1, prob=0.5):
        self.mag = mag
        self.prob = prob

    def __call__(self, results: Dict) -> Dict:
        if random.random() > self.prob:
            return results
        img = results['img']
        H, W = img.shape[:2]
        frac = [0.2, 0.3, 0.4][self.mag if 0 <= self.mag < 3 else 2]
        src = np.asarray(_border_grid(W, H), np.float32)
        dst = src.copy()
        cell = 0.33 * W
        for col in range(4):
            dx = np.random.uniform(-frac, frac) * cell
            if col == 0:
                dx = abs(dx)
            if col == 3:
                dx = -abs(dx)
            dst[col * 3:(col + 1) * 3, 0] += dx
        results['img'] = _tps_warp(img, src, dst)
        return results


@PIPELINES.register_module()
class Distort:
    """Free-form xy jitter of border control points
    (reference tps_transform.py Distort)."""

    def __init__(self, mag=-1, prob=0.5):
        self.mag = mag
        self.prob = prob

    def __call__(self, results: Dict) -> Dict:
        if random.random() > self.prob:
            return results
        img = results['img']
        H, W = img.shape[:2]
        frac = [0.2, 0.3, 0.4][self.mag if 0 <= self.mag < 3 else 2]
        src = np.asarray(_border_grid(W, H), np.float32)
        dst = src + np.random.uniform(
            -frac, frac, src.shape).astype(np.float32) * \
            np.asarray([0.33 * W, 0.33 * H], np.float32)
        results['img'] = _tps_warp(img, src, dst)
        return results


@PIPELINES.register_module()
class Curve:
    """Vertical parabolic bend (reference tps_transform.py Curve)."""

    def __init__(self, mag=-1, prob=0.5):
        self.mag = mag
        self.prob = prob

    def __call__(self, results: Dict) -> Dict:
        if random.random() > self.prob:
            return results
        img = results['img']
        H, W = img.shape[:2]
        frac = [0.15, 0.25, 0.35][self.mag if 0 <= self.mag < 3 else 2]
        amp = frac * H * random.choice([-1.0, 1.0])
        src = np.asarray(_border_grid(W, H, nx=5), np.float32)
        dst = src.copy()
        for i, (x, _) in enumerate(src):
            t = x / max(W - 1, 1)
            dst[i, 1] += amp * (4 * t * (1 - t))  # parabola, 0 at edges
        results['img'] = _tps_warp(img, src, dst)
        return results
