"""Remaining recog pipeline transforms from the reference inventory
(``pipelines/ocr_transforms.py``): OnlineCropOCR, FancyPCA,
RandomPaddingOCR, OpencvToPil/PilToOpencv.
"""
from __future__ import annotations

import math
import random
from typing import Dict

import cv2
import numpy as np

from ...registry import PIPELINES


@PIPELINES.register_module()
class OnlineCropOCR:
    """Crop a text region from a full image using gt box keys in the
    annotation (reference ocr_transforms.py OnlineCropOCR)."""

    def __init__(self, box_keys=('x1', 'y1', 'x2', 'y2', 'x3', 'y3', 'x4',
                                 'y4'), jitter_prob=0.5,
                 max_jitter_ratio_x=0.05, max_jitter_ratio_y=0.02):
        self.box_keys = box_keys
        self.jitter_prob = jitter_prob
        self.max_jitter_ratio_x = max_jitter_ratio_x
        self.max_jitter_ratio_y = max_jitter_ratio_y

    def __call__(self, results: Dict) -> Dict:
        img_info = results.get('img_info', {})
        if not all(k in img_info for k in self.box_keys):
            return results
        pts = np.array([float(img_info[k]) for k in self.box_keys],
                       np.float32).reshape(-1, 2)
        if random.random() < self.jitter_prob:
            w = pts[:, 0].max() - pts[:, 0].min()
            h = pts[:, 1].max() - pts[:, 1].min()
            pts[:, 0] += np.random.uniform(
                -self.max_jitter_ratio_x, self.max_jitter_ratio_x,
                len(pts)) * w
            pts[:, 1] += np.random.uniform(
                -self.max_jitter_ratio_y, self.max_jitter_ratio_y,
                len(pts)) * h
        img = results['img']
        x0 = min(max(int(pts[:, 0].min()), 0), img.shape[1] - 1)
        x1 = min(int(math.ceil(pts[:, 0].max())), img.shape[1])
        y0 = min(max(int(pts[:, 1].min()), 0), img.shape[0] - 1)
        y1 = min(int(math.ceil(pts[:, 1].max())), img.shape[0])
        crop = img[y0:max(y1, y0 + 1), x0:max(x1, x0 + 1)]
        results['img'] = crop
        results['img_shape'] = crop.shape
        return results


@PIPELINES.register_module()
class FancyPCA:
    """AlexNet-style PCA color jitter (reference ocr_transforms.py
    FancyPCA; eigvecs/eigvals of ImageNet RGB)."""

    # columns = eigenvectors (RGB): column 0 is the luminance direction;
    # transposing would turn the dominant-eigenvalue jitter into a
    # chroma shift
    _EIG_VEC = np.array([[-0.5675, 0.7192, 0.4009],
                         [-0.5808, -0.0045, -0.8140],
                         [-0.5836, -0.6948, 0.4203]], np.float32)
    _EIG_VAL = np.array([0.2175, 0.0188, 0.0045], np.float32)

    def __init__(self, alpha_std=0.1):
        self.alpha_std = alpha_std

    def __call__(self, results: Dict) -> Dict:
        img = results['img'].astype(np.float32)
        if img.shape[-1] != 3:
            return results
        alpha = np.random.normal(0, self.alpha_std, 3).astype(np.float32)
        noise = (self._EIG_VEC @ (alpha * self._EIG_VAL))[::-1]  # RGB->BGR
        scale = 255.0 if results['img'].dtype == np.uint8 else 1.0
        img = img + noise[None, None, :] * scale
        results['img'] = np.clip(img, 0, scale if scale > 1 else None
                                 ).astype(results['img'].dtype)
        return results


@PIPELINES.register_module()
class RandomPaddingOCR:
    """Random border padding (reference ocr_transforms.py RandomPaddingOCR)."""

    def __init__(self, max_ratio=(0.1, 0.2, 0.1, 0.2), box_type=None):
        self.max_ratio = max_ratio

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        h, w = img.shape[:2]
        top = int(random.uniform(0, self.max_ratio[0]) * h)
        bottom = int(random.uniform(0, self.max_ratio[1]) * h)
        left = int(random.uniform(0, self.max_ratio[2]) * w)
        right = int(random.uniform(0, self.max_ratio[3]) * w)
        out = cv2.copyMakeBorder(img, top, bottom, left, right,
                                 cv2.BORDER_REPLICATE)
        if out.ndim == 2:
            out = out[:, :, None]
        results['img'] = out
        results['img_shape'] = out.shape
        return results


@PIPELINES.register_module()
class OpencvToPil:
    """BGR ndarray -> PIL (reference transform_wrappers bridging)."""

    def __call__(self, results: Dict) -> Dict:
        from PIL import Image
        img = results['img'][..., ::-1]
        results['img'] = Image.fromarray(img.squeeze() if
                                         img.shape[-1] == 1 else img)
        return results


@PIPELINES.register_module()
class PilToOpencv:
    def __call__(self, results: Dict) -> Dict:
        img = np.asarray(results['img'])
        if img.ndim == 2:
            img = img[:, :, None]
        else:
            img = img[..., ::-1]
        results['img'] = np.ascontiguousarray(img)
        return results
