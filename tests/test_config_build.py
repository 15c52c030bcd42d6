"""Build-and-run smoke over EVERY shipped config (reference scheme:
tests/test_models/test_recog_config.py:10-157 builds each config, fabricates
a _demo_mm_inputs batch and runs forward_train + forward_test).

For each config under configs/: build the model through the public
builders, fabricate a demo batch at the pipeline's test geometry, run one
forward_train (loss finite) and one forward_test (finite scores) under jit.
"""
import glob
import os

import numpy as np
import pytest

pytestmark = [pytest.mark.heavy, pytest.mark.slow]

import jax
import jax.numpy as jnp

import tps_pp_tpu.models  # noqa: F401  (registry population)
import tps_pp_tpu.losses  # noqa: F401
from tps_pp_tpu.config import load_config

RECOG_CONFIGS = sorted(glob.glob('configs/textrecog/*/*.py'))
DET_CONFIGS = sorted(glob.glob('configs/textdet/*/*.py'))


def _pipeline_geometry(cfg):
    """(H, W, C) from the config's test pipeline ResizeOCR/LoadImage."""
    height, width, channels = 32, 64, 3

    def walk(node):
        nonlocal height, width, channels
        if isinstance(node, dict):
            if node.get('type') == 'ResizeOCR':
                height = int(node.get('height', height))
                width = int(node.get('max_width') or
                            node.get('min_width') or width)
            if node.get('type') == 'LoadImageFromFile' and \
                    node.get('color_type') == 'grayscale':
                channels = 1
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    data = cfg.get('data', {})
    walk(data.get('test', data.get('val', {})))
    bb = cfg['model'].get('backbone') or {}
    channels = int(bb.get('in_channels') or bb.get('input_channels') or
                   channels)
    return height, width, channels


@pytest.mark.parametrize('path', RECOG_CONFIGS,
                         ids=[p.split('/')[-1][:-3] for p in RECOG_CONFIGS])
def test_recog_config_builds_and_runs(path):
    from tps_pp_tpu.apis.recognizer import build_recognizer

    cfg = load_config(path)
    lc = cfg['model'].get('label_convertor', {})
    if lc.get('dict_file') and not os.path.exists(lc['dict_file']):
        # site-local dict files (e.g. sar_r31_parallel_decoder_chinese's
        # printed-Chinese dict) aren't mounted here — substitute a small
        # generated dict so the rest of the config still builds and runs
        import tempfile
        tmp = tempfile.NamedTemporaryFile('w', suffix='.txt',
                                  encoding='utf-8',
                                  delete=False)
        tmp.write('\n'.join(list('0123456789abcdefgh中文')))
        tmp.close()
        cfg['model']['label_convertor'] = dict(lc, dict_file=tmp.name)
    rec = build_recognizer(cfg['model'])
    H, W, C = _pipeline_geometry(cfg)
    rng = jax.random.PRNGKey(0)
    variables = rec.init_variables(rng, (2, H, W, C))
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, H, W, C)), jnp.float32)
    vr = jnp.ones((2,), jnp.float32)

    # forward_train: fabricated gt through the config's own convertor
    if type(rec).__name__ == 'SegRecognizer':
        n_cls = len(rec.label_convertor.idx2char)
        batch = {'img': img,
                 'gt_seg': jnp.asarray(np.random.default_rng(1).integers(
                     0, n_cls, (2, H, W)), jnp.int32)}
    else:
        td = rec.label_convertor.str2tensor(['ab3', 'x0'])
        batch = {'img': img, 'valid_ratio': vr,
                 'padded_targets': jnp.asarray(td['padded_targets'])}
        if 'target_lengths' in td:
            batch['target_lengths'] = jnp.asarray(td['target_lengths'])
    loss, (losses, _) = rec.compute_loss(variables, batch,
                                         jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), (path, losses)

    # forward_test: the full jitted predict + host decode
    results = rec.simple_test(variables, img, vr)
    assert len(results) == 2
    for r in results:
        assert isinstance(r['text'], str)


@pytest.mark.parametrize('path', DET_CONFIGS,
                         ids=[p.split('/')[-1][:-3] for p in DET_CONFIGS])
def test_det_config_builds_and_runs(path):
    """Every det config: full TextDetector inference + (single-stage)
    forward_train loss on generated targets."""
    from tps_pp_tpu.apis.detector import TextDetector
    from tps_pp_tpu.apis.train_det import (_TARGET_KEYS,
                                           build_det_targets,
                                           build_detector_module)
    from tps_pp_tpu.registry import LOSSES

    cfg = load_config(path)
    det = TextDetector(cfg['model'], img_size=(64, 64))
    img = np.zeros((80, 96, 3), np.uint8)
    img[20:40, 10:50] = 255
    results = det.detect_batch([img])
    assert isinstance(results[0], list)

    det_type = cfg['model']['type']
    if det_type not in _TARGET_KEYS:
        return  # DRRG / OCRMaskRCNN train paths are driven in their own
        # tests (host graph/proposal sampling around the jitted steps)
    module = build_detector_module(cfg['model'])
    targets = build_det_targets(cfg['model'])
    loss_cfg = dict(cfg['model'].get('loss') or
                    {'type': f'{det_type}Loss'})
    loss_fn = LOSSES.get(loss_cfg.pop('type'))(**loss_cfg)
    poly = np.array([8, 16, 56, 16, 56, 40, 8, 40], np.float32)
    item = targets({'img': np.zeros((64, 64, 3), np.uint8),
                    'gt_polygons': [poly], 'gt_polygons_ignore': []})
    variables = det.variables
    out = det.module.apply(variables, jnp.zeros((1, 64, 64, 3)), train=True,
                           mutable=['batch_stats'])[0]
    keys = _TARGET_KEYS[det_type]
    ds = 0.25 if det_type in ('PANet', 'PSENet') else 1.0

    def rescale(a):
        a = np.asarray(a, np.float32)
        if ds == 1.0:
            return a
        import cv2
        size = (int(a.shape[-1] * ds), int(a.shape[-2] * ds))
        if a.ndim == 2:
            return cv2.resize(a, size, interpolation=cv2.INTER_NEAREST)
        return np.stack([cv2.resize(x, size,
                                    interpolation=cv2.INTER_NEAREST)
                         for x in a])

    tgt = {k: jnp.asarray(rescale(item[k]))[None] for k in keys}
    losses = loss_fn(out, tgt)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (path, k)


def test_kie_ner_configs_build():
    from tps_pp_tpu.registry import ENCODERS, HEADS

    for name in ('sdmgr_unet16_60e_wildreceipt',
                 'sdmgr_novisual_60e_wildreceipt',
                 'sdmgr_novisual_60e_wildreceipt_openset'):
        kie = load_config(f'configs/kie/sdmgr/{name}.py')
        head_cfg = dict(kie['model']['head'])
        head = HEADS.get(head_cfg.pop('type'))(**head_cfg)
        v = head.init(jax.random.PRNGKey(0),
                      jnp.zeros((4, 4, 5)), jnp.ones((4, 8), jnp.int32))
        node_cls, edge_cls = head.apply(v, jnp.zeros((4, 4, 5)),
                                        jnp.ones((4, 8), jnp.int32))
        assert node_cls.shape == (4, kie['model']['head']['num_classes'])

    ner = load_config('configs/ner/bert_softmax/bert_softmax_cluener_18e.py')
    enc_cfg = dict(ner['model']['encoder'])
    enc_cfg.update(hidden_size=32, num_hidden_layers=1,
                   num_attention_heads=2, intermediate_size=64)
    enc = ENCODERS.get(enc_cfg.pop('type'))(**enc_cfg)
    v = enc.init(jax.random.PRNGKey(0), jnp.ones((1, 16), jnp.int32))
    out = enc.apply(v, jnp.ones((1, 16), jnp.int32))
    assert out.shape == (1, 16, 32)
