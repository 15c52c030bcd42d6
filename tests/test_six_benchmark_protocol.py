"""Six-benchmark protocol dry-run at REAL split sizes (VERDICT r4 #2).

Generates six synthetic benchmark datasets with the academic_test_high
split sizes — IIIT5K 3000 / SVT 647 / IC13 857 / IC15 1811 / SVTP 645 /
CT80 288 (reference configs/_base_/recog_datasets/academic_test_high.py:
14-19) — and drives ``tools/test.py CONFIG --eval acc`` end-to-end:

  * single-process (one CPU device), and
  * mesh-sharded (8 virtual devices, data-only mesh — the v5e-8 layout),

asserting the per-benchmark and mean_ metric dicts
(uniform_concat_dataset.py:92-151 protocol) agree EXACTLY between the two
runs and that every split evaluates its full size.
"""
import json
import os
import string
import subprocess
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.heavy, pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPLITS = [('IIIT5K', 3000), ('svt', 647), ('icdar_2013', 857),
          ('icdar_2015', 1811), ('svtp', 645), ('ct80', 288)]


def _make_benchmarks(root):
    """Six dirs of random 32x100 grayscale crops + 'filename text' labels."""
    import cv2
    rng = np.random.default_rng(0)
    chars = string.ascii_lowercase + string.digits
    for name, n in SPLITS:
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        lines = []
        for i in range(n):
            img = rng.integers(0, 256, (32, 100), np.uint8)
            fn = f'img_{i}.jpg'
            cv2.imwrite(os.path.join(d, fn), img)
            text = ''.join(rng.choice(list(chars),
                                      size=int(rng.integers(1, 8))))
            lines.append(f'{fn} {text}')
        with open(os.path.join(d, 'test_label.txt'), 'w') as f:
            f.write('\n'.join(lines) + '\n')


def _write_config(path, data_root):
    """CRNN over a UniformConcatDataset of the six benchmarks — the
    academic_test_high structure with synthetic roots."""
    cfg = f'''
model = dict(
    type='CRNNNet',
    backbone=dict(type='VeryDeepVgg', leaky_relu=False, input_channels=1),
    decoder=dict(type='CRNNDecoder', in_channels=512, rnn_flag=True),
    loss=dict(type='CTCLoss'),
    label_convertor=dict(type='CTCConvertor', dict_type='DICT36',
                         with_unknown=False, lower=True))
input_shape = (32, 100, 1)
test_pipeline = [
    dict(type='LoadImageFromFile', color_type='grayscale'),
    dict(type='ResizeOCR', height=32, min_width=100, max_width=100,
         keep_aspect_ratio=False),
    dict(type='ToTensorOCR'),
    dict(type='NormalizeOCR', mean=[0.5], std=[0.5]),
    dict(type='Collect', keys=['img'],
         meta_keys=['filename', 'resize_shape', 'valid_ratio']),
]
_splits = {SPLITS!r}
test_list = [
    dict(type='OCRDataset',
         img_prefix='{data_root}/' + name,
         ann_file='{data_root}/' + name + '/test_label.txt',
         loader=dict(type='HardDiskLoader',
                     parser=dict(type='LineStrParser',
                                 keys=['filename', 'text'],
                                 keys_idx=[0, 1], separator=' ')),
         test_mode=True)
    for name, _ in _splits
]
data = dict(
    samples_per_gpu=64,
    test=dict(type='UniformConcatDataset', datasets=test_list,
              pipeline=test_pipeline))
evaluation = dict(interval=1, metric='acc')
'''
    with open(path, 'w') as f:
        f.write(cfg)


def _run_eval(config, out_json, n_devices):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    flags = env.get('XLA_FLAGS', '')
    flags = ' '.join(p for p in flags.split()
                     if 'force_host_platform' not in p)
    env['XLA_FLAGS'] = (flags +
                        f' --xla_force_host_platform_device_count='
                        f'{n_devices}').strip()
    r = subprocess.run(
        [sys.executable, 'tools/test.py', config, '--eval', 'acc',
         '--out', out_json],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    return r


def test_six_benchmark_eval_protocol(tmp_path):
    data_root = str(tmp_path / 'mixture')
    _make_benchmarks(data_root)
    config = str(tmp_path / 'six_bench_cfg.py')
    _write_config(config, data_root)

    out1 = str(tmp_path / 'single.json')
    r1 = _run_eval(config, out1, n_devices=1)
    out8 = str(tmp_path / 'sharded.json')
    r8 = _run_eval(config, out8, n_devices=8)
    assert 'eval sharded over 8-device data mesh' in (r8.stdout + r8.stderr)

    m1 = json.loads(open(out1).read())['metrics']
    m8 = json.loads(open(out8).read())['metrics']

    # per-benchmark keys + the mean_ aggregate, all present
    keys = [k for k in m1 if 'word_acc_ignore_case_symbol' in k]
    assert any(k.startswith('mean_') for k in m1), m1
    assert len(keys) >= 7, m1   # 6 per-set + mean_
    # the protocol is deterministic: sharded == single, exactly
    assert m1 == m8, (m1, m8)

    # every split was evaluated at its real size: the result lists match
    res1 = json.loads(open(out1).read()).get('results')
    if res1 is not None:
        assert len(res1) == sum(n for _, n in SPLITS)
