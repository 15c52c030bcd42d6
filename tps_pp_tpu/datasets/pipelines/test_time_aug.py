"""MultiRotateAugOCR — rotation TTA for tall crops.

Reference ``pipelines/test_time_aug.py``: when a crop is taller than wide
(H/W > rotate_degrees threshold logic), evaluate 0/90/270-degree rotations
and let the recognizer keep the highest-scoring hypothesis
(merge_aug_results, reference encode_decode_recognizer.py:227-236).

Host-side: `expand` produces the rotated variants; `merge_aug_results`
implements the reference's mean-score argmax.
"""
from __future__ import annotations

from typing import Dict, List

import cv2
import numpy as np

from ...registry import PIPELINES


@PIPELINES.register_module()
class MultiRotateAugOCR:
    def __init__(self, rotate_degrees=(0, 90, 270), force_rotate=False,
                 transforms=(), **kwargs):
        self.rotate_degrees = list(rotate_degrees)
        self.force_rotate = force_rotate
        # the remaining test pipeline (resize/normalize/collect), applied to
        # every rotation variant like the reference wraps its sub-pipeline
        self.transforms = None
        if transforms:
            from .transforms import Compose
            self.transforms = Compose(transforms)

    def should_rotate(self, img: np.ndarray) -> bool:
        # reference rotates whenever the crop is taller than wide
        # (test_time_aug.py:60-63: height <= width -> [0] only)
        h, w = img.shape[:2]
        return self.force_rotate or h > w

    def expand(self, img: np.ndarray) -> List[np.ndarray]:
        if not self.should_rotate(img):
            return [img]
        out = []
        for deg in self.rotate_degrees:
            if deg == 0:
                out.append(img)
            elif deg == 90:
                # reference mapping (test_time_aug.py:66-71): 90 -> one
                # CCW np.rot90, 180 -> two, 270 -> three
                out.append(np.ascontiguousarray(np.rot90(img, k=1)))
            elif deg == 180:
                out.append(np.ascontiguousarray(np.rot90(img, k=2)))
            elif deg == 270:
                out.append(np.ascontiguousarray(np.rot90(img, k=3)))
            else:
                h, w = img.shape[:2]
                M = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
                out.append(cv2.warpAffine(img, M, (w, h)))
        return out

    def __call__(self, results: Dict) -> Dict:
        variants = self.expand(results['img'])
        if self.transforms is None:
            results['aug_imgs'] = variants
            results['aug_n'] = len(variants)
            results['aug_total'] = len(self.rotate_degrees)
            return results
        processed = []
        for v in variants:
            r = dict(results)
            r['img'] = v
            p = self.transforms(r)
            if p is None:   # Compose contract: a filtered sample
                return None  # propagates so the dataset retry can skip
            processed.append(p)
        out = dict(processed[0])
        out['aug_imgs'] = [p['img'] for p in processed]
        out['aug_metas'] = [p.get('img_metas', {}) for p in processed]
        out['aug_n'] = len(processed)
        out['aug_total'] = len(self.rotate_degrees)
        return out


def merge_aug_results(aug_results: List[Dict]) -> Dict:
    """Highest mean-score hypothesis (reference
    encode_decode_recognizer.py:227-236)."""
    out_text, out_score = '', -1.0
    for result in aug_results:
        text = result['text']
        score = sum(result['score']) / max(1, len(text))
        if score > out_score:
            out_text, out_score = text, score
    return dict(text=out_text, score=out_score)
