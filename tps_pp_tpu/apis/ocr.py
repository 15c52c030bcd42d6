"""End-user OCR API (reference ``mmocr/utils/ocr.py:164-717`` ``MMOCR`` +
fork-added recognition-only ``utils/recog.py``).

``MMOCR(det=..., recog=...)`` runs detection -> per-box crop -> batched
recognition -> optional line merging, mirroring the reference's
det_recog_kie_inference flow (ocr.py:499-717). Either stage can be omitted:
det-only returns boundaries, recog-only behaves like the reference's
single-model path.

Usage::

    ocr = MMOCR(det='DBNet', recog='CRNN')
    ocr.readtext('demo.jpg', merge=True)
    # -> [{'filename': ..., 'result': [{'box', 'box_score', 'text',
    #      'text_score'}, ...], 'merged': [...]}]
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Union

import numpy as np

from .inference import init_recognizer, model_inference
from ..utils.box_util import crop_img, stitch_boxes_into_lines

# model-name -> config path (reference MMOCR.textdet_models /
# textrecog_models tables, ocr.py:214-311)
DET_CONFIGS = {
    'DBNet': 'configs/textdet/dbnet/dbnet_r18_fpnc_1200e_icdar2015.py',
    'PANet': 'configs/textdet/panet/panet_r18_fpem_ffm_600e_icdar2015.py',
    'PSENet': 'configs/textdet/psenet/psenet_r50_fpnf_600e_icdar2015.py',
}
RECOG_CONFIGS = {
    'CRNN': 'configs/textrecog/crnn/crnn_academic_dataset.py',
    'NRTR_TPS': 'configs/textrecog/nrtr/nrtr_tps++.py',
    'SAR': 'configs/textrecog/sar/sar_r31_parallel_decoder_academic.py',
    'ABINet': 'configs/textrecog/abinet/abinet_academic.py',
}


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _resolve(table: Dict[str, str], name_or_path: Optional[str]):
    if not name_or_path:
        return None
    path = table.get(name_or_path, name_or_path)
    if not os.path.isabs(path) and not os.path.exists(path):
        candidate = os.path.join(_repo_root(), path)
        if os.path.exists(candidate):
            path = candidate
    return path


class MMOCR:
    """det+recog end-to-end inference (reference ocr.py:164-717)."""

    def __init__(self, det: Optional[str] = 'DBNet',
                 recog: Optional[str] = 'CRNN',
                 kie: Optional[str] = None,
                 det_config: Optional[str] = None,
                 det_ckpt: Optional[str] = None,
                 recog_config: Optional[str] = None,
                 recog_ckpt: Optional[str] = None,
                 kie_ckpt: Optional[str] = None,
                 det_img_size=(640, 640), seed: int = 0, **kwargs):
        self.detector = None
        self.rec = None
        if det:
            from .detector import init_detector
            cfg = det_config or _resolve(DET_CONFIGS, det)
            self.detector = init_detector(cfg, checkpoint=det_ckpt,
                                          img_size=det_img_size,
                                          rng_seed=seed)
        if recog:
            cfg = recog_config or _resolve(RECOG_CONFIGS, recog)
            self.rec, self.rec_variables = init_recognizer(
                cfg, recog_ckpt, rng_seed=seed)
        if kie:
            assert self.detector is not None and self.rec is not None, (
                'KIE requires both det and recog (reference ocr.py:349-352)')
            self._init_kie(kie, kie_ckpt, seed)

    def _init_kie(self, kie, kie_ckpt, seed):
        """SDMGR node classification over detected+recognized boxes
        (reference MMOCR kie stage, ocr.py:499-585)."""
        import jax
        import jax.numpy as jnp
        from ..models.kie import SDMGRHead

        self.kie_max_chars = 32
        self.kie_chars = ('0123456789abcdefghijklmnopqrstuvwxyz'
                          'ABCDEFGHIJKLMNOPQRSTUVWXYZ')
        self.kie_char2idx = {c: i + 1 for i, c in enumerate(self.kie_chars)}
        self.kie_head = SDMGRHead(num_chars=len(self.kie_chars) + 2,
                                  num_classes=26)
        n = 4
        self.kie_variables = self.kie_head.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((n, n, 5), jnp.float32),
            jnp.zeros((n, self.kie_max_chars), jnp.int32))
        if kie_ckpt:
            from ..utils.checkpoint import load_variables
            self.kie_variables = load_variables(kie_ckpt, self.kie_variables)

    def _kie_infer(self, box_results):
        import jax
        import jax.numpy as jnp
        from ..datasets.kie_dataset import KIEDataset

        n = len(box_results)
        if n == 0:
            return box_results
        boxes = np.asarray([[min(r['box'][0::2]), min(r['box'][1::2]),
                             max(r['box'][0::2]), max(r['box'][1::2])]
                            for r in box_results], np.float32)
        texts = np.zeros((n, self.kie_max_chars), np.int32)
        for i, r in enumerate(box_results):
            for j, ch in enumerate(str(r['text'])[:self.kie_max_chars]):
                texts[i, j] = self.kie_char2idx.get(
                    ch, len(self.kie_char2idx) + 1)
        ds = KIEDataset.__new__(KIEDataset)
        ds.norm = 10.0
        rel = ds.compute_relations(boxes)
        node_cls, _ = self.kie_head.apply(self.kie_variables,
                                          jnp.asarray(rel),
                                          jnp.asarray(texts))
        labels = np.asarray(jnp.argmax(node_cls, -1))
        confs = np.asarray(jnp.max(jax.nn.softmax(node_cls, -1), -1))
        for r, lab, conf in zip(box_results, labels, confs):
            r['label'] = int(lab)
            r['label_score'] = float(conf)
        return box_results

    # -- single-stage paths ------------------------------------------------
    def detect(self, img) -> List[np.ndarray]:
        img = self._load(img)
        return self.detector.detect(img)

    def recognize(self, imgs, batch_mode: bool = True):
        return model_inference(self.rec, self.rec_variables, imgs,
                               batch_mode=batch_mode)

    # -- end to end ---------------------------------------------------------
    def readtext(self, img, output: Optional[str] = None,
                 details: bool = False, merge: bool = False,
                 merge_xdist: float = 20.0, batch_mode: bool = True,
                 img_out_dir: Optional[str] = None,
                 **kwargs) -> List[Dict]:
        """img: path | ndarray | list of either. Returns one dict per image
        (reference det_recog_kie_inference, ocr.py:499-585)."""
        single = not isinstance(img, (list, tuple))
        inputs = [img] if single else list(img)
        out = []
        for item in inputs:
            arr = self._load(item)
            filename = item if isinstance(item, str) else ''
            if self.detector is None:
                rec = self.recognize(arr, batch_mode=False)
                out.append({'filename': filename, 'text': rec['text'],
                            'score': rec['score']})
                continue
            boundaries = self.detector.detect(arr)
            box_results = []
            crops, boxes = [], []
            for b in boundaries:
                box = self._to_quad(b[:-1])
                crop = crop_img(arr, box)
                if crop.size == 0:
                    continue
                boxes.append((box, float(b[-1])))
                crops.append(crop)
            if self.rec is not None and crops:
                recs = self.recognize(crops, batch_mode=batch_mode)
                if isinstance(recs, dict):
                    recs = [recs]
            else:
                recs = [{'text': '', 'score': 0.0}] * len(crops)
            for (box, bscore), rec in zip(boxes, recs):
                score = rec.get('score', 0.0)
                if isinstance(score, (list, tuple, np.ndarray)):
                    score = float(np.mean(score)) if len(score) else 0.0
                box_results.append({
                    'box': [float(v) for v in box],
                    'box_score': bscore,
                    'text': rec.get('text', ''),
                    'text_score': float(score),
                })
            if getattr(self, 'kie_head', None) is not None:
                box_results = self._kie_infer(box_results)
            res = {'filename': filename, 'result': box_results}
            if img_out_dir:
                from ..utils.visualize import det_recog_show_result
                name = os.path.basename(filename) or f'img_{len(out)}.jpg'
                det_recog_show_result(
                    arr, res, out_file=os.path.join(img_out_dir,
                                                    f'out_{name}'))
            if merge:
                res['merged'] = stitch_boxes_into_lines(
                    [{'box': r['box'], 'text': r['text']}
                     for r in box_results], max_x_dist=merge_xdist)
            out.append(res)
        if not details:
            for r in out:
                for b in r.get('result', []):
                    b.pop('text_score', None)
        if output is not None:   # exported file == returned value
            import json
            with open(output, 'w') as f:
                json.dump(out, f, indent=2)
        return out

    # -- helpers -------------------------------------------------------------
    @staticmethod
    def _load(img) -> np.ndarray:
        if isinstance(img, np.ndarray):
            return img
        import cv2
        arr = cv2.imread(img)
        if arr is None:
            raise FileNotFoundError(img)
        return arr

    @staticmethod
    def _to_quad(flat) -> List[float]:
        """Boundary polygon (2k floats) -> 8-float axis-aligned quad."""
        pts = np.asarray(flat, np.float32).reshape(-1, 2)
        x0, y0 = pts.min(0)
        x1, y1 = pts.max(0)
        return [float(x0), float(y0), float(x1), float(y0),
                float(x1), float(y1), float(x0), float(y1)]

    def single_inference(self, img):
        return self.readtext(img)


class TextRecInference(MMOCR):
    """Recognition-only API kept for round-1 compatibility
    (reference utils/recog.py)."""

    def __init__(self, config: Union[str, Dict],
                 checkpoint: Optional[str] = None, batch_mode: bool = False,
                 seed: int = 0, input_shape=None):
        self.detector = None
        self.rec, self.rec_variables = init_recognizer(
            config, checkpoint, rng_seed=seed, input_shape=input_shape)
        self.batch_mode = batch_mode

    def readtext(self, img, output: Optional[str] = None, **kwargs):
        results = model_inference(self.rec, self.rec_variables, img,
                                  batch_mode=self.batch_mode)
        if output is not None:
            import json
            with open(output, 'w') as f:
                json.dump(results, f, indent=2)
        return results
