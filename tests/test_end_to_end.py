"""End-to-end toy training + eval + inference (reference analog:
tests/test_apis/test_single_gpu_test.py + test_model_inference.py):
overfit a tiny CRNN on the toy dataset, verify the loss drops, run the full
eval path and the model_inference / readtext APIs."""
import os

import numpy as np
import pytest

import tps_pp_tpu.models  # noqa: F401
import tps_pp_tpu.losses  # noqa: F401
from tps_pp_tpu.apis.recognizer import build_recognizer
from tps_pp_tpu.apis.train import train_recognizer
from tps_pp_tpu.apis.test import eval_recognizer
from tps_pp_tpu.datasets import build_dataset

pytestmark = [pytest.mark.heavy, pytest.mark.slow]

TOY = os.path.join(os.path.dirname(__file__), 'data/ocr_toy_dataset')


def tiny_crnn_cfg():
    return dict(
        type='CRNNNet',
        label_convertor=dict(type='CTCConvertor', dict_type='DICT36',
                             with_unknown=False, lower=True),
        backbone=dict(type='VeryDeepVgg', leaky_relu=False,
                      input_channels=1),
        decoder=dict(type='CRNNDecoder', in_channels=512, rnn_flag=False),
        loss=dict(type='CTCLoss'),
        max_seq_len=10,
    )


def toy_dataset(test_mode):
    return build_dataset(dict(
        type='OCRDataset', img_prefix=TOY,
        ann_file=os.path.join(TOY, 'label.txt'),
        loader=dict(type='HardDiskLoader',
                    parser=dict(type='LineStrParser',
                                keys=['filename', 'text'],
                                keys_idx=[0, 1], separator=' ')),
        pipeline=[
            dict(type='LoadImageFromFile', color_type='grayscale'),
            dict(type='ResizeOCR', height=32, min_width=100, max_width=100,
                 keep_aspect_ratio=False),
            dict(type='ToTensorOCR'),
            dict(type='NormalizeOCR', mean=[0.5], std=[0.5]),
            dict(type='Collect', keys=['img']),
        ],
        test_mode=test_mode))


def test_train_eval_loop(tmp_path):
    rec = build_recognizer(tiny_crnn_cfg())
    train_ds = toy_dataset(False)
    cfg = dict(samples_per_gpu=10, total_epochs=12, log_interval=10,
               input_shape=(32, 100, 1),
               optimizer=dict(type='Adam', lr=2e-3))
    state, history = train_recognizer(rec, train_ds, cfg,
                                      work_dir=str(tmp_path / 'wd'), seed=0)
    losses = [h['loss'] for h in history if 'loss' in h]
    assert len(losses) >= 2
    assert losses[-1] < losses[0] * 0.7, losses  # it learns

    # checkpoint was written and restores
    from tps_pp_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / 'wd'))
    assert mgr.latest_step() is not None
    restored = mgr.restore(state)
    assert int(restored.step) == int(state.step)

    # eval path end-to-end
    metrics = eval_recognizer(rec, state.variables(), toy_dataset(True),
                              batch_size=10)
    assert 'word_acc_ignore_case_symbol' in metrics

    # weights-only load from a FULL checkpoint (subset template: orbax
    # needs partial_restore, previously raised ValueError)
    variables = rec.init_variables(__import__('jax').random.PRNGKey(1),
                                   (1, 32, 100, 1))
    loaded = mgr.load_weights(variables)
    leaf0 = __import__('jax').tree.leaves(loaded['params'])[0]
    ref0 = __import__('jax').tree.leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf0), np.asarray(ref0))

    # resume honors the explicit path and continues from the saved epoch:
    # a fully-trained job resumes with NOTHING left to do (no replay) and
    # keeps the restored optimizer step
    state2, history2 = train_recognizer(
        rec, train_ds, cfg, work_dir=str(tmp_path / 'wd2'),
        resume_from=str(tmp_path / 'wd'), seed=0)
    assert int(state2.step) == int(state.step)
    assert not [h for h in history2 if 'loss' in h]   # no epochs replayed


def test_model_inference_api():
    from tps_pp_tpu.apis.inference import init_recognizer, model_inference
    cfg = dict(model=tiny_crnn_cfg(), test_pipeline=[
        dict(type='LoadImageFromFile', color_type='grayscale'),
        dict(type='ResizeOCR', height=32, min_width=100, max_width=100,
             keep_aspect_ratio=False),
        dict(type='ToTensorOCR'),
        dict(type='NormalizeOCR', mean=[0.5], std=[0.5]),
        dict(type='Collect', keys=['img']),
    ])
    rec, variables = init_recognizer(cfg, input_shape=(1, 32, 100, 1))
    img_path = os.path.join(TOY, 'img_0.jpg')
    res = model_inference(rec, variables, img_path)
    assert 'text' in res and 'score' in res
    # ndarray input + batch
    import cv2
    arr = cv2.imread(img_path, cv2.IMREAD_GRAYSCALE)[:, :, None]
    res2 = model_inference(rec, variables, [arr, arr])
    assert len(res2) == 2
    # batch_mode sorts by valid_ratio for fused-decode early exit but
    # must return results in INPUT order — mix widths to force a resort
    wide = np.concatenate([arr, arr], axis=1)
    mixed = [wide, arr, wide, arr]
    batched = model_inference(rec, variables, mixed, batch_mode=True,
                              test_pipeline=[
                                  dict(type='LoadImageFromNdarray',
                                       color_type='grayscale'),
                                  dict(type='ResizeOCR', height=32,
                                       min_width=100, max_width=100,
                                       keep_aspect_ratio=True),
                                  dict(type='ToTensorOCR'),
                                  dict(type='NormalizeOCR', mean=[0.5],
                                       std=[0.5]),
                                  dict(type='Collect', keys=['img']),
                              ])
    per_image = [model_inference(rec, variables, m, batch_mode=False,
                                 test_pipeline=[
                                     dict(type='LoadImageFromNdarray',
                                          color_type='grayscale'),
                                     dict(type='ResizeOCR', height=32,
                                          min_width=100, max_width=100,
                                          keep_aspect_ratio=True),
                                     dict(type='ToTensorOCR'),
                                     dict(type='NormalizeOCR', mean=[0.5],
                                          std=[0.5]),
                                     dict(type='Collect', keys=['img']),
                                 ]) for m in mixed]
    assert [r['text'] for r in batched] == [r['text'] for r in per_image]


def test_nrtr_tps_toy_overfit(tmp_path):
    """The flagship topology (tiny dims, TPS++ included) must learn on the
    toy set through the sharded train step — validates the AR training path
    beyond CRNN."""
    from tps_pp_tpu.apis.flagship import nrtr_tps_pp_cfg
    cfg = nrtr_tps_pp_cfg(tiny=True)
    rec = build_recognizer(cfg)
    train_ds = build_dataset(dict(
        type='OCRDataset', img_prefix=TOY,
        ann_file=os.path.join(TOY, 'label.txt'),
        loader=dict(type='HardDiskLoader',
                    parser=dict(type='LineStrParser',
                                keys=['filename', 'text'],
                                keys_idx=[0, 1], separator=' ')),
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='ResizeOCR', height=32, min_width=64, max_width=64,
                 keep_aspect_ratio=False),
            dict(type='ToTensorOCR'),
            dict(type='NormalizeOCR', mean=[0.485, 0.456, 0.406],
                 std=[0.229, 0.224, 0.225]),
            dict(type='Collect', keys=['img']),
        ],
        test_mode=False))
    tcfg = dict(samples_per_gpu=8, total_epochs=12, log_interval=1,
                input_shape=(32, 64, 3),
                optimizer=dict(type='Adam', lr=1e-3))
    state, history = train_recognizer(rec, train_ds, tcfg, seed=0)
    losses = [h['loss'] for h in history if 'loss' in h]
    assert min(losses[-3:]) < losses[0] * 0.8, losses[:3] + losses[-3:]


def test_serve_model_http(tmp_path):
    """tools/deployment/serve_model.py: the TorchServe-handler analog served
    over real HTTP (ping, raw + base64 predictions, bad body, bad path)."""
    import base64
    import importlib.util
    import json
    import threading
    import urllib.error
    import urllib.request
    from http.server import ThreadingHTTPServer

    import cv2

    spec = importlib.util.spec_from_file_location(
        'serve_model', os.path.join(os.path.dirname(__file__), '..',
                                    'tools', 'deployment', 'serve_model.py'))
    sm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sm)

    cfg = {'model': {
        'type': 'CRNNNet',
        'backbone': dict(type='VeryDeepVgg', leaky_relu=False,
                         input_channels=1),
        'decoder': dict(type='CRNNDecoder', in_channels=512, rnn_flag=True),
        'loss': dict(type='CTCLoss'),
        'label_convertor': dict(type='CTCConvertor', dict_type='DICT36',
                                with_unknown=False, lower=True),
    }, 'input_shape': (32, 100, 1), 'test_pipeline': [
        dict(type='LoadImageFromFile', color_type='grayscale'),
        dict(type='ResizeOCR', height=32, min_width=100, max_width=100,
             keep_aspect_ratio=False),
        dict(type='ToTensorOCR'),
        dict(type='NormalizeOCR', mean=[0.5], std=[0.5]),
        dict(type='Collect', keys=['img']),
    ]}
    model = sm._Model(cfg)
    server = ThreadingHTTPServer(('127.0.0.1', 0),
                                 sm.make_handler(model, 'ocr'))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f'http://127.0.0.1:{port}'
        ping = json.loads(urllib.request.urlopen(
            base + '/ping', timeout=30).read())
        assert ping == {'status': 'Healthy'}

        img = np.full((32, 100, 3), 255, np.uint8)
        cv2.putText(img, 'hi', (5, 22), cv2.FONT_HERSHEY_SIMPLEX, 0.7,
                    (0, 0, 0), 2)
        raw = cv2.imencode('.jpg', img)[1].tobytes()

        def post(path, body):
            req = urllib.request.Request(base + path, data=body,
                                         method='POST')
            try:
                r = urllib.request.urlopen(req, timeout=120)
                return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, out = post('/predictions/ocr', raw)
        assert code == 200 and 'text' in out and 'score' in out
        code_b64, out_b64 = post('/predictions/ocr', base64.b64encode(raw))
        assert code_b64 == 200 and out_b64['text'] == out['text']
        code, err = post('/predictions/ocr', b'garbage\x00')
        assert code == 400 and 'error' in err
        code, err = post('/predictions/nope', raw)
        assert code == 404
    finally:
        server.shutdown()

    # detection mode (--det): same wire contract, boundary_result payload
    det_cfg = {'model': {
        'type': 'DBNet',
        'backbone': dict(type='ResNetDet', stage_blocks=[1, 1, 1, 1],
                         base_channels=8),
        'neck': dict(type='FPNC', in_channels=[8, 16, 32, 64],
                     lateral_channels=16),
        'head': dict(type='DBHead', in_channels=64),
    }}
    det_model = sm._Model(det_cfg, det=True)
    det_server = ThreadingHTTPServer(('127.0.0.1', 0),
                                     sm.make_handler(det_model, 'det'))
    det_port = det_server.server_address[1]
    threading.Thread(target=det_server.serve_forever, daemon=True).start()
    try:
        img = np.full((64, 64, 3), 255, np.uint8)
        cv2.rectangle(img, (10, 20), (50, 40), (0, 0, 0), -1)
        body = cv2.imencode('.jpg', img)[1].tobytes()
        req = urllib.request.Request(
            f'http://127.0.0.1:{det_port}/predictions/det', data=body,
            method='POST')
        r = urllib.request.urlopen(req, timeout=120)
        out = json.loads(r.read())
        assert r.status == 200 and 'boundary_result' in out
        assert isinstance(out['boundary_result'], list)
    finally:
        det_server.shutdown()


def test_train_with_rbg_rng(tmp_path):
    """cfg rng_impl='rbg' (the TPU-default hardware RNG for dropout,
    utils/platform.training_rng) trains end-to-end on CPU too and
    learns — guards the typed-key path through make_train_step/fold_in."""
    rec = build_recognizer(tiny_crnn_cfg())
    train_ds = toy_dataset(False)
    cfg = dict(samples_per_gpu=10, total_epochs=6, log_interval=10,
               input_shape=(32, 100, 1), rng_impl='rbg',
               optimizer=dict(type='Adam', lr=2e-3))
    state, history = train_recognizer(rec, train_ds, cfg,
                                      work_dir=str(tmp_path / 'wd'), seed=0)
    losses = [h['loss'] for h in history if 'loss' in h]
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses


def test_training_rng_impl_selection():
    from tps_pp_tpu.utils.platform import training_rng
    import jax
    # CPU backend: 'auto' must stay threefry (bit-exact suite determinism)
    assert 'rbg' not in str(training_rng(0, 'auto').dtype)
    assert 'rbg' in str(training_rng(0, 'rbg').dtype)
    k = training_rng(7, 'threefry')
    assert np.allclose(
        np.asarray(jax.random.key_data(k)),
        np.asarray(jax.random.key_data(jax.random.PRNGKey(7))))
