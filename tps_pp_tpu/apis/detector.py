"""Text-detector construction + single/batch inference
(the detection half of reference ``apis/inference.py:19-194``).

Builds DBNet / PANet / PSENet from the same dict-config schema as the
reference configs (type= names preserved) and runs the device forward +
host postprocess, returning boundary lists ``[x1, y1, ..., score]`` scaled
back to the original image size.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from ..config import ConfigDict, load_config
from ..registry import BACKBONES, HEADS, NECKS


_POSTPROCESSORS = {
    'DBPostprocessor': 'DBPostprocessor',
    'PANPostprocessor': 'PANPostprocessor',
    'PSEPostprocessor': 'PSEPostprocessor',
}


def _build(reg, cfg: Dict):
    cfg = dict(cfg)
    return reg.get(cfg.pop('type'))(**cfg)


class TextDetector:
    """module + variables + postprocessor bundle with a fixed input size."""

    def __init__(self, model_cfg: Dict, img_size: Tuple[int, int] = (640, 640),
                 rng_seed: int = 0, checkpoint: Optional[str] = None):
        import jax
        from ..models import textdet as td

        model_cfg = dict(model_cfg)
        self.det_type = model_cfg.get('type', 'DBNet')
        module_cls = (td.DBNetModule if self.det_type == 'DBNet'
                      else td.PANetModule)
        self.module = module_cls(
            backbone=_build(BACKBONES, model_cfg['backbone']),
            neck=_build(NECKS, model_cfg['neck']),
            head=_build(HEADS, model_cfg['head']))
        pp_cfg = dict(model_cfg.get('postprocessor') or {})
        pp_type = pp_cfg.pop('type', {'DBNet': 'DBPostprocessor',
                                      'PANet': 'PANPostprocessor',
                                      'PSENet': 'PSEPostprocessor'
                                      }[self.det_type])
        self.postprocessor = getattr(td, _POSTPROCESSORS[pp_type])(**pp_cfg)
        self.img_size = tuple(img_size)
        H, W = self.img_size
        self.variables = self.module.init(
            jax.random.PRNGKey(rng_seed),
            jax.numpy.zeros((1, H, W, 3), jax.numpy.float32))
        if checkpoint:
            from ..utils.checkpoint import load_variables
            self.variables = load_variables(checkpoint, self.variables)
        self._jitted = jax.jit(
            lambda v, x: self.module.apply(v, x, train=False))

    def _prep(self, img: np.ndarray) -> Tuple[np.ndarray, float, float]:
        import cv2
        h0, w0 = img.shape[:2]
        H, W = self.img_size
        resized = cv2.resize(img, (W, H)).astype(np.float32) / 255.0
        return resized, w0 / W, h0 / H

    def detect(self, img: np.ndarray) -> List[np.ndarray]:
        """img: HWC uint8/float BGR. Returns boundaries [x.., y.., score]
        in original-image coordinates."""
        import jax.numpy as jnp
        x, sx, sy = self._prep(img)
        out = np.asarray(self._jitted(self.variables, jnp.asarray(x)[None]))[0]
        if self.det_type == 'DBNet':
            boundaries = self.postprocessor(out[..., 0])
        else:
            boundaries = self.postprocessor(out)
        scaled = []
        for b in boundaries:
            b = np.asarray(b, np.float32).copy()
            b[:-1:2] *= sx
            b[1:-1:2] *= sy
            scaled.append(b)
        return scaled


def init_detector(config: Union[str, Dict], checkpoint: Optional[str] = None,
                  img_size=(640, 640), rng_seed: int = 0) -> TextDetector:
    """Reference init_detector (apis/inference.py:19-56) for det configs."""
    if isinstance(config, str):
        cfg = load_config(config)
        model_cfg = cfg['model']
    else:
        cfg = ConfigDict._wrap(dict(config))
        model_cfg = cfg.get('model', cfg)
    return TextDetector(model_cfg, img_size=img_size, rng_seed=rng_seed,
                        checkpoint=checkpoint)
