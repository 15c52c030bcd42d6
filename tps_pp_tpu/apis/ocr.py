"""End-user recognition API (reference ``mmocr/utils/recog.py`` — the
fork-added recognition-only MMOCR variant; full det+recog ``utils/ocr.py:164``
readtext interface is matched for the recognition path).

Usage::

    ocr = TextRecInference('configs/textrecog/crnn/crnn_academic.py',
                           checkpoint=None)
    ocr.readtext('demo_text_recog.jpg')
    # -> [{'text': 'hello', 'score': [...]}]
"""
from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np

from .inference import init_recognizer, model_inference


class TextRecInference:
    def __init__(self, config: Union[str, Dict],
                 checkpoint: Optional[str] = None,
                 batch_mode: bool = False, seed: int = 0,
                 input_shape=None):
        self.rec, self.variables = init_recognizer(
            config, checkpoint, rng_seed=seed, input_shape=input_shape)
        self.batch_mode = batch_mode

    def readtext(self, img, output: Optional[str] = None, **kwargs):
        """img: path | ndarray | list of either. Returns result dict(s)."""
        results = model_inference(self.rec, self.variables, img,
                                  batch_mode=self.batch_mode)
        if output is not None:
            import json
            with open(output, 'w') as f:
                json.dump(results, f, indent=2)
        return results

    def single_inference(self, img):
        return self.readtext(img)


# reference-compatible alias (utils/ocr.py names the class ``MMOCR``)
MMOCR = TextRecInference
