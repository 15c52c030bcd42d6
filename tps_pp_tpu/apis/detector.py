"""Text-detector construction + single/batch inference
(the detection half of reference ``apis/inference.py:19-194``).

Builds all seven detector families from the same dict-config schema as the
reference configs (type= names preserved — DBNet / PANet / PSENet / FCENet /
TextSnake / DRRG / OCRMaskRCNN) and runs the device forward + host
postprocess, returning boundary lists ``[x1, y1, ..., score]`` scaled back
to the original image size.

The device forward is jitted at a fixed input size and accepts batches
(``detect_batch``) — the reference eval loop feeds batched fixed-size
tensors through ``single_gpu_test`` (reference apis/test.py); the per-image
``detect`` is a batch of one.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from ..config import ConfigDict, load_config
from ..registry import BACKBONES, NECKS


def _build(reg, cfg: Dict):
    cfg = dict(cfg)
    return reg.get(cfg.pop('type'))(**cfg)


class TextDetector:
    """module + variables + postprocessor bundle with a fixed input size.

    Supports every det family shipped in ``configs/textdet/``:
      * DBNet / PANet / PSENet / FCENet / TextSnake — single-stage map
        detectors: one jitted batched forward, host postprocess per image;
      * DRRG — jitted backbone+neck+head forward (batched), host local-graph
        construction + GCN + clustering per image (graph sizes vary);
      * OCRMaskRCNN — two-stage: per-image proposals/RoI pooling on host
        around jitted sub-forwards (reference OCRMaskRCNN.simple_test).
    """

    def __init__(self, model_cfg: Dict, img_size: Tuple[int, int] = (640, 640),
                 rng_seed: int = 0, checkpoint: Optional[str] = None):
        import jax
        import jax.numpy as jnp
        from ..models import textdet as td
        from .train_det import build_detector_module

        model_cfg = dict(model_cfg)
        self.det_type = model_cfg.get('type', 'DBNet')
        self.img_size = tuple(img_size)
        H, W = self.img_size
        self._det = None  # host-orchestrated detector (DRRG / MaskRCNN)

        if self.det_type == 'OCRMaskRCNN':
            def _head(cfg_key, cls, **defaults):
                c = dict(model_cfg.get(cfg_key) or {})
                c.pop('type', None)
                return cls(**{**defaults, **c})

            self.module = td.MaskRCNNModule(
                backbone=_build(BACKBONES, model_cfg['backbone']),
                neck=_build(NECKS, model_cfg['neck']),
                rpn_head=_head('rpn_head', td.RPNHead),
                box_head=_head('box_head', td.BoxHead),
                mask_head=_head('mask_head', td.MaskHead))
            self._det = td.MaskRCNNDetector(
                self.module,
                text_repr_type=model_cfg.get('text_repr_type', 'quad'))
            self.variables = self._det.init_variables(
                jax.random.PRNGKey(rng_seed), (1, H, W, 3))
            self.postprocessor = None
            self._jitted = None
        elif self.det_type == 'DRRG':
            import flax.linen as nn

            neck_out = dict(model_cfg['neck']).get('out_channels', 32)

            class _DRRGNet(nn.Module):
                backbone: object
                neck: object
                head: object

                @nn.compact
                def __call__(self, img, train=False):
                    feats = self.backbone(img, train=train)
                    f = self.neck(feats, train=train)
                    return f, self.head(f, train=train)

            pp_cfg = dict(model_cfg.get('postprocessor') or {})
            pp_cfg.pop('type', None)
            self._det = td.DRRGDetector(
                td.DRRGHead(in_channels=neck_out),
                postprocessor=td.DRRGPostprocessor(**pp_cfg))
            self.module = _DRRGNet(
                backbone=_build(BACKBONES, model_cfg['backbone']),
                neck=_build(NECKS, model_cfg['neck']),
                head=self._det.head)
            net_vars = self.module.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, H, W, 3)))
            nfl = self._det.node_feat_len(neck_out)
            gcn_vars = self._det.gcn.init(
                jax.random.PRNGKey(rng_seed + 1),
                jnp.zeros((1, 4, nfl), jnp.float32),
                jnp.zeros((1, 4, 4), jnp.float32),
                jnp.zeros((1, 2), jnp.int32))
            self.variables = {'net': net_vars, 'head': None, 'gcn': gcn_vars}
            self.postprocessor = None
            self._jitted = jax.jit(
                lambda v, x: self.module.apply(v, x, train=False))
        else:
            self.module = build_detector_module(model_cfg)
            pp_cfg = dict(model_cfg.get('postprocessor') or {})
            pp_type = pp_cfg.pop(
                'type', {'DBNet': 'DBPostprocessor',
                         'PANet': 'PANPostprocessor',
                         'PSENet': 'PSEPostprocessor',
                         'FCENet': 'FCEPostprocessor',
                         'TextSnake': 'TextSnakePostprocessor'
                         }[self.det_type])
            self.postprocessor = getattr(td, pp_type)(**pp_cfg)
            self.variables = self.module.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, H, W, 3)))
            self._jitted = jax.jit(
                lambda v, x: self.module.apply(v, x, train=False))
        if checkpoint:
            from ..utils.checkpoint import load_variables
            self.variables = load_variables(checkpoint, self.variables)

    # head-output resolution relative to the model input: PAN/PSE heads
    # emit 1/4-resolution maps and their postprocessors return map-space
    # coords (reference pan_head.py:32/pse_head.py:24 downsample_ratio=0.25,
    # applied in HeadMixin.get_boundary:72 as 1/ratio). DBNet upsamples
    # in-head, FCE scales per level inside its postprocessor, the rest are
    # full-res.
    _DOWNSAMPLE = {'PANet': 0.25, 'PSENet': 0.25}

    def _prep(self, img: np.ndarray) -> Tuple[np.ndarray, float, float]:
        import cv2
        h0, w0 = img.shape[:2]
        H, W = self.img_size
        ds = self._DOWNSAMPLE.get(self.det_type, 1.0)
        resized = cv2.resize(img, (W, H)).astype(np.float32) / 255.0
        return resized, w0 / W / ds, h0 / H / ds

    def _post_single(self, out) -> List[np.ndarray]:
        """Raw per-image head output -> boundaries (model-input coords)."""
        if self.det_type == 'DBNet':
            return self.postprocessor(out[..., 0])
        if self.det_type == 'FCENet':
            return self.postprocessor(
                [(np.asarray(c), np.asarray(r)) for c, r in out])
        return self.postprocessor(np.asarray(out))

    def detect_batch(self, imgs: List[np.ndarray]) -> List[List[np.ndarray]]:
        """Batched detection: ONE jitted device forward over the stacked
        fixed-size batch, host postprocess per image. Returns per-image
        boundary lists in original-image coordinates."""
        import jax.numpy as jnp

        preps = [self._prep(img) for img in imgs]

        def _batch():
            # bucket to the next power of two: eval's ragged last batch
            # (and any caller-chosen size) reuses a bounded set of
            # compiled programs instead of recompiling the detector per N.
            # All result loops below run over len(imgs), so padded rows
            # are simply never read.
            from ..utils.batching import pad_rows_pow2
            b = jnp.asarray(np.stack([p[0] for p in preps]))
            return pad_rows_pow2((b,), len(imgs))[0]

        if self.det_type == 'OCRMaskRCNN':
            # per-image path (two-stage proposals): the stacked batch is
            # never used
            results = [self._det.detect(self.variables,
                                        jnp.asarray(p[0])[None])
                       for p in preps]
        elif self.det_type == 'DRRG':
            feats, pred_maps = self._jitted(self.variables['net'], _batch())
            det_vars = {'head': {'params':
                                 self.variables['net']['params']['head']},
                        'gcn': self.variables['gcn']}
            feats, pred_maps = np.asarray(feats), np.asarray(pred_maps)
            results = [self._det.detect(det_vars, feats[b:b + 1],
                                        pred_maps=pred_maps[b:b + 1])
                       for b in range(len(imgs))]
        else:
            out = self._jitted(self.variables, _batch())
            if self.det_type == 'FCENet':
                out_np = [[(np.asarray(c)[b], np.asarray(r)[b])
                           for c, r in out] for b in range(len(imgs))]
            else:
                out_np = np.asarray(out)
            results = [self._post_single(out_np[b]) for b in range(len(imgs))]
        scaled_all = []
        for (_, sx, sy), boundaries in zip(preps, results):
            scaled = []
            for b in boundaries:
                b = np.asarray(b, np.float32).copy()
                b[:-1:2] *= sx
                b[1:-1:2] *= sy
                scaled.append(b)
            scaled_all.append(scaled)
        return scaled_all

    def detect(self, img: np.ndarray) -> List[np.ndarray]:
        """img: HWC uint8/float BGR. Returns boundaries [x.., y.., score]
        in original-image coordinates."""
        return self.detect_batch([img])[0]


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
