"""Character-kernel target generation for segmentation-based recognition.

Re-implements reference ``datasets/pipelines/ocr_seg_targets.py:12-200``:
per-character boxes are shrunk (rect style: centered scale; quad style:
corner-wise pull toward neighbors) and rasterized into
  * a binary attention kernel (shrink ``attn_shrink_ratio``), and
  * a char-index segmentation kernel (shrink ``seg_shrink_ratio``,
    filled with the convertor's char index),
with the padded region marked ``pad_val`` (=ignore) in the seg map and 0 in
the effective mask.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import cv2
import numpy as np

from ...registry import CONVERTORS, PIPELINES


def shrink_char_rect(char_rect: Sequence[float], shrink_ratio: float):
    """Centered rectangle shrink (reference ocr_seg_targets.py:89-108)."""
    x_min, y_min, x_max, y_max = char_rect
    w, h = x_max - x_min, y_max - y_min
    x_min_s = round((x_min + x_max - w * shrink_ratio) / 2)
    y_min_s = round((y_min + y_max - h * shrink_ratio) / 2)
    x_max_s = round((x_min + x_max + w * shrink_ratio) / 2)
    y_max_s = round((y_min + y_max + h * shrink_ratio) / 2)
    return np.array([[x_min_s, y_min_s], [x_max_s, y_min_s],
                     [x_max_s, y_max_s], [x_min_s, y_max_s]])


def shrink_char_quad(char_quad: Sequence[float], shrink_ratio: float):
    """Corner-wise quadrangle shrink (reference ocr_seg_targets.py:48-87)."""
    points = [[char_quad[0], char_quad[1]], [char_quad[2], char_quad[3]],
              [char_quad[4], char_quad[5]], [char_quad[6], char_quad[7]]]

    def dist(p, q):
        return ((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2) ** 0.5

    shrink_points = []
    for idx, point in enumerate(points):
        p1 = points[(idx + 3) % 4]
        p2 = points[(idx + 1) % 4]
        d1, d2 = dist(p1, point), dist(p2, point)
        md = min(d1, d2)
        v1 = [p1[0] - point[0], p1[1] - point[1]]
        v2 = [p2[0] - point[0], p2[1] - point[1]]
        t1 = shrink_ratio * md / d1 if md != 0 else 0.
        t2 = shrink_ratio * md / d2 if md != 0 else 0.
        shrink_points.append([
            round(point[0] + v1[0] * t1 + v2[0] * t2),
            round(point[1] + v1[1] * t1 + v2[1] * t2),
        ])
    return np.array(shrink_points)


@PIPELINES.register_module()
class OCRSegTargets:
    """Pipeline step: char boxes + chars -> attention/seg kernels."""

    def __init__(self, label_convertor=None, attn_shrink_ratio=0.5,
                 seg_shrink_ratio=0.25, box_type='char_rects', pad_val=255):
        assert 0. < attn_shrink_ratio < 1.0
        assert 0. < seg_shrink_ratio < 1.0
        assert box_type in ('char_rects', 'char_quads')
        assert label_convertor is not None
        self.attn_shrink_ratio = attn_shrink_ratio
        self.seg_shrink_ratio = seg_shrink_ratio
        self.box_type = box_type
        self.pad_val = pad_val
        if isinstance(label_convertor, dict):
            from ... import convertors  # noqa: F401 — populate the registry
            cfg = dict(label_convertor)
            self.label_convertor = CONVERTORS.get(cfg.pop('type'))(**cfg)
        else:
            self.label_convertor = label_convertor

    def generate_kernels(self, resize_shape, pad_shape, char_boxes,
                         char_inds, shrink_ratio, binary):
        """One (pad_h, pad_w) kernel; the padded right strip gets pad_val
        (reference ocr_seg_targets.py:110-153)."""
        char_kernel = np.zeros(pad_shape, dtype=np.int32)
        # padding strips (right AND bottom) are pad_val, not background
        char_kernel[:, resize_shape[1]:] = self.pad_val
        char_kernel[resize_shape[0]:, :] = self.pad_val
        for box, ind in zip(char_boxes, char_inds):
            if self.box_type == 'char_rects':
                poly = shrink_char_rect(box, shrink_ratio)
            else:
                poly = shrink_char_quad(box, shrink_ratio)
            fill = 1 if binary else ind
            cv2.fillConvexPoly(char_kernel, poly.astype(np.int32), fill)
        return char_kernel

    def __call__(self, results: Dict) -> Dict:
        resize_shape = tuple(results['resize_shape'][:2])
        pad_shape = tuple(results['pad_shape'][:2])
        # char boxes are in pre-resize coords: whatever geometry the image
        # had when ResizeOCR consumed it (padding/rotation upstream shift
        # the boxes AND grow the canvas — reference ocr_seg_targets.py:158
        # reads the then-current img_shape). ResizeOCR records that shape;
        # ori_shape is the fallback for pipelines without a resize.
        src_shape = tuple(results.get('pre_resize_shape') or
                          results.get('ori_shape',
                                      results['img_shape']))[:2]
        h_scale = resize_shape[0] / src_shape[0]
        w_scale = resize_shape[1] / src_shape[1]

        char_boxes: List[List[float]] = []
        char_inds: List[int] = []
        ann = results['ann_info']
        for i, box in enumerate(ann[self.box_type]):
            box = list(box)
            npts = 2 if self.box_type == 'char_rects' else 4
            for j in range(npts):
                box[j * 2] = round(box[j * 2] * w_scale)
                box[j * 2 + 1] = round(box[j * 2 + 1] * h_scale)
            char_boxes.append(box)
            char_inds.append(
                self.label_convertor.str2idx([ann['chars'][i]])[0][0])

        attn = self.generate_kernels(resize_shape, pad_shape, char_boxes,
                                     char_inds, self.attn_shrink_ratio,
                                     binary=True)
        seg = self.generate_kernels(resize_shape, pad_shape, char_boxes,
                                    char_inds, self.seg_shrink_ratio,
                                    binary=False)
        mask = np.ones(pad_shape, dtype=np.int32)
        mask[:resize_shape[0], resize_shape[1]:] = 0
        results['gt_attn'] = attn
        results['gt_seg'] = seg
        results['gt_mask'] = mask
        # reference packs [attn, seg, mask] as a BitmapMasks under
        # 'gt_kernels' (ocr_seg_targets.py:198-200) and its seg pipeline
        # Collects that key; a plain list serves the same role here
        results['gt_kernels'] = [attn, seg, mask]
        results['mask_fields'] = ['gt_kernels']
        return results
