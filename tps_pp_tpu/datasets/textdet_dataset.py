"""Text-detection dataset (§2.6: reference TextDetDataset / IcdarDataset).

Annotations are JSON lines ({'file_name', 'annotations': [{'polygon':
[x1,y1,...], 'text'?, 'ignore'?}]}) — the common denominator of the
reference's icdar/textdet loaders. Produces fixed-size images + DBNet
ground-truth maps via models/textdet/targets.py, and evaluates boundaries
with hmean-iou (or hmean-ic13).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

from ..registry import DATASETS


@DATASETS.register_module()
class TextDetDataset:
    def __init__(self, ann_file: str, img_prefix: str = '',
                 img_size=(640, 640), target_cfg: Optional[Dict] = None,
                 test_mode: bool = False, **kwargs):
        with open(ann_file, encoding='utf-8') as f:
            self.lines = [json.loads(line) for line in f if line.strip()]
        self.img_prefix = img_prefix
        self.img_size = tuple(img_size)
        self.test_mode = test_mode
        from ..models.textdet.targets import DBNetTargets
        self.targets = DBNetTargets(**(target_cfg or {}))

    def __len__(self):
        return len(self.lines)

    def _load(self, index: int):
        line = self.lines[index]
        path = os.path.join(self.img_prefix, line['file_name'])
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        h0, w0 = img.shape[:2]
        H, W = self.img_size
        img = cv2.resize(img, (W, H))
        sx, sy = W / w0, H / h0
        polys, polys_ignore = [], []
        for ann in line.get('annotations', []):
            p = np.asarray(ann['polygon'], np.float32).reshape(-1, 2)
            p[:, 0] *= sx
            p[:, 1] *= sy
            # don't-care ('###') regions are carried separately — they mask
            # target generation and the hmean protocol, not train/score as
            # real text
            (polys_ignore if ann.get('ignore') else polys).append(p)
        return img, polys, polys_ignore

    def __getitem__(self, index: int) -> Dict:
        img, polys, polys_ignore = self._load(index)
        H, W = self.img_size
        out = {
            'img': img.astype(np.float32) / 255.0,
            'gt_polygons': polys,
            'gt_polygons_ignore': polys_ignore,
            'img_metas': {'filename': self.lines[index]['file_name'],
                          'valid_ratio': 1.0},
            'text': '',
        }
        if not self.test_mode:
            out.update(self.targets.generate(
                polys, H, W, polygons_ignore=polys_ignore))
        return out

    def evaluate(self, results: List[List[np.ndarray]], metric='hmean-iou',
                 **kwargs) -> Dict:
        """results: per-image lists of predicted boundaries."""
        gts, gts_ignore = [], []
        for i in range(len(self)):
            _, polys, polys_ignore = self._load(i)
            gts.append(polys)
            gts_ignore.append(polys_ignore)
        if metric == 'hmean-ic13':
            from ..evaluation.hmean_ic13 import eval_hmean_ic13
            return eval_hmean_ic13(results, gts, gt_ignore=gts_ignore)
        from ..evaluation import eval_hmean_iou
        return eval_hmean_iou(results, gts, gt_ignore=gts_ignore)


# reference name for the COCO-style icdar wrapper — same JSON-lines loader
DATASETS.register_module(name='IcdarDataset', module=TextDetDataset)
