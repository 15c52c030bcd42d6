"""init_recognizer / model_inference — the programmatic inference API.

Mirrors reference ``apis/inference.py:19-194`` (init_detector +
model_inference): build from config + checkpoint, push images through the
test pipeline, run the jitted predict path, return {'text','score'} dicts.
TPU difference: batches are padded to a fixed shape before device_put (one
transfer instead of collate+scatter) and the compiled program is reused
across calls of the same batch size.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from ..config import ConfigDict, load_config
from ..datasets.pipelines.transforms import Compose
from .recognizer import build_recognizer


def init_recognizer(config: Union[str, Dict], checkpoint: Optional[str] = None,
                    rng_seed: int = 0, input_shape=None):
    """Build a recognizer (+ fresh or checkpointed variables).

    Returns (recognizer, variables). ``checkpoint`` may be an orbax dir, a
    .npz from utils.checkpoint.save_variables, or a torch ``.pth`` —
    reference released checkpoints convert on the fly via the auto rule
    table (utils.torch_convert.rules_for_config), matching the reference
    ``init_detector`` one-call recipe (apis/inference.py:19-56).
    """
    import jax

    if isinstance(config, str):
        cfg = load_config(config)
        model_cfg = cfg['model']
        test_pipeline = cfg.get('test_pipeline')
    else:
        cfg = ConfigDict._wrap(dict(config))
        model_cfg = cfg.get('model', cfg)
        test_pipeline = cfg.get('test_pipeline')

    rec = build_recognizer(model_cfg)
    if input_shape is None:
        # configs may pin (H, W, C) — e.g. CRNN's grayscale (32, 100, 1)
        cfg_shape = cfg.get('input_shape') if hasattr(cfg, 'get') else None
        input_shape = ((1, *cfg_shape) if cfg_shape is not None
                       else (1, 32, 128, 3))
    variables = rec.init_variables(jax.random.PRNGKey(rng_seed), input_shape)
    if checkpoint:
        from ..utils.checkpoint import CheckpointManager, load_variables
        if checkpoint.endswith(('.pth', '.pt')):
            from ..utils.torch_convert import convert_checkpoint, load_pth
            variables = convert_checkpoint(load_pth(checkpoint), rec,
                                           variables)
        elif checkpoint.endswith('.npz'):
            variables = load_variables(checkpoint, variables)
        else:
            variables = CheckpointManager(checkpoint).load_weights(variables)
    rec._test_pipeline_cfg = test_pipeline
    return rec, variables


def model_inference(rec, variables, imgs,
                    test_pipeline: Optional[Sequence] = None,
                    batch_mode: bool = False) -> Union[Dict, List[Dict]]:
    """Run recognition on image path(s) or ndarray(s)
    (reference apis/inference.py:59-194).
    """
    single = not isinstance(imgs, (list, tuple))
    if single:
        imgs = [imgs]
    pipeline_cfg = test_pipeline or getattr(rec, '_test_pipeline_cfg', None)
    if pipeline_cfg is None:
        pipeline_cfg = [
            dict(type='ResizeOCR', height=32, min_width=128, max_width=128,
                 keep_aspect_ratio=False),
            dict(type='ToTensorOCR'),
            dict(type='NormalizeOCR', mean=[0.485, 0.456, 0.406],
                 std=[0.229, 0.224, 0.225]),
            dict(type='Collect', keys=['img']),
        ]
    # swap the loader stage for ndarray inputs
    # (reference apis/inference.py:107-110)
    steps = [dict(s) for s in pipeline_cfg]
    is_nd = isinstance(imgs[0], np.ndarray)
    if steps and steps[0].get('type', '').startswith('LoadImage'):
        if is_nd:
            steps[0]['type'] = 'LoadImageFromNdarray'
    elif is_nd:
        steps.insert(0, dict(type='LoadImageFromNdarray'))
    else:
        steps.insert(0, dict(type='LoadImageFromFile'))
    pipeline = Compose(steps)

    datas = []
    for img in imgs:
        if is_nd:
            results = dict(img=img, img_info=dict(filename=None))
        else:
            results = dict(img_path=img, img_info=dict(filename=img))
        datas.append(pipeline(results))

    def run(subset):
        batch = np.stack([d['img'] for d in subset]).astype(np.float32)
        vr = np.asarray([d['img_metas'].get('valid_ratio', 1.0) or 1.0
                         for d in subset], np.float32)
        metas = [d['img_metas'] for d in subset]
        return rec.simple_test(variables, batch, vr, img_metas=metas)

    if batch_mode:
        # sort by valid_ratio (true-width share of the padded crop — a
        # proxy for text length) so each fused-decode batch block holds
        # similar-length texts: the in-kernel all-rows-EOS early exit
        # fires when the SLOWEST row in a block finishes, so grouping
        # short words lets their blocks stop decoding early. Results are
        # restored to input order.
        order = sorted(range(len(datas)), key=lambda i: float(
            datas[i]['img_metas'].get('valid_ratio', 1.0) or 1.0))
        sorted_results = run([datas[i] for i in order])
        results = [None] * len(datas)
        for r, i in zip(sorted_results, order):
            results[i] = r
    else:
        # per-image contract (reference apis/utils.py disables batching
        # when batch_mode=False): pipelines with keep_aspect_ratio can
        # yield per-image widths that cannot stack
        results = [run([d])[0] for d in datas]
    return results[0] if single else results
