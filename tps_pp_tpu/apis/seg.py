"""SegRecognizer: config -> segmentation-based recognizer bundle.

The reference's ``SegRecognizer`` (textrecog/recognizer/seg_recognizer.py:
11-137) assembles backbone + FPNOCR neck + SegHead + SegLoss + SegConvertor;
train supervision is the per-pixel char-class map (OCRSegTargets), test
decodes connected components via SegConvertor.tensor2str.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigDict
from ..registry import BACKBONES, CONVERTORS, HEADS, LOSSES, NECKS
from ..models.recognizers.seg import SegRecognizerModule

_DTYPES = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}


def _build(reg, cfg, **extra):
    cfg = dict(cfg)
    return reg.get(cfg.pop('type'))(**cfg, **extra)


class SegRecognizer:
    """module + convertor + loss with the TextRecognizer surface subset
    used by eval/inference (predict, simple_test, compute_loss)."""

    def __init__(self, cfg: Dict[str, Any]):
        cfg = ConfigDict._wrap(dict(cfg))
        self.cfg = cfg
        self.dtype = _DTYPES[cfg.get('dtype', 'float32')]

        lc_cfg = dict(cfg['label_convertor'])
        self.label_convertor = CONVERTORS.build(lc_cfg)
        num_classes = len(self.label_convertor.idx2char)

        head_cfg = dict(cfg['head'])
        head_cfg.setdefault('num_classes', num_classes)
        self.module = SegRecognizerModule(
            backbone=_build(BACKBONES, cfg['backbone'], dtype=self.dtype),
            neck=_build(NECKS, cfg['neck'], dtype=self.dtype),
            head=_build(HEADS, head_cfg, dtype=self.dtype))
        loss_cfg = dict(cfg.get('loss') or {'type': 'SegLoss'})
        self.loss_obj = LOSSES.get(loss_cfg.pop('type'))(**loss_cfg)
        self._predict_jit = None

    def init_variables(self, rng, input_shape: Tuple[int, ...]):
        img = jnp.zeros(input_shape, self.dtype)
        return self.module.init(rng, img)

    def compute_loss(self, variables, batch, dropout_rng=None,
                     train: bool = True):
        out, new_state = self.module.apply(
            variables, batch['img'], train=train, mutable=['batch_stats'])
        gt = batch['gt_seg']
        if out.shape[1:3] != gt.shape[1:3]:
            gt = jax.image.resize(gt.astype(jnp.float32),
                                  (gt.shape[0],) + out.shape[1:3],
                                  'nearest').astype(jnp.int32)
        losses = self.loss_obj(out, gt)
        total = sum(jax.tree.leaves(losses))
        return total, (losses, new_state)

    def predict(self, variables, img, valid_ratio=None,
                bucket_batch: bool = True, mesh=None):
        # mesh accepted for signature parity with TextRecognizer; the seg
        # forward is pure XLA, so jit auto-partitions sharded inputs fine
        n = int(img.shape[0])
        if bucket_batch and n & (n - 1):   # serving: bounded jit cache
            from ..utils.batching import pad_rows_pow2
            img, = pad_rows_pow2((img,), n)
        if self._predict_jit is None:
            self._predict_jit = jax.jit(
                lambda v, x: self.module.apply(v, x, train=False))
        return self._predict_jit(variables, img)[:n]

    def simple_test(self, variables, img, valid_ratio=None, img_metas=None,
                    bucket_batch: bool = True):
        out = np.asarray(self.predict(
            variables, img, bucket_batch=bucket_batch)).astype(np.float32)
        if img_metas is None:
            vr = (np.asarray(valid_ratio).tolist()
                  if valid_ratio is not None else [1.0] * out.shape[0])
            img_metas = [{'valid_ratio': r} for r in vr]
        texts, scores = self.label_convertor.tensor2str(out, img_metas)
        return [dict(text=t, score=s) for t, s in zip(texts, scores)]
