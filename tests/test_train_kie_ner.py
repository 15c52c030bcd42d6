"""KIE (SDMGR) + NER training paths — the reference trains both through
``tools/train.py`` (kie/extractors/sdmgr.py:16, ner/classifiers/
ner_classifier.py:8); these drive the same dispatch on tiny synthetic data.
"""
import json
import subprocess
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.heavy, pytest.mark.slow]


def _write_wildreceipt(tmp_path, n=8, with_images=False):
    """Synthetic wildreceipt-style jsonl: two separable node classes."""
    lines = []
    rng = np.random.default_rng(0)
    for i in range(n):
        anns = []
        for j in range(4):
            label = j % 2
            y = int(10 + 20 * j + rng.integers(0, 3))
            text = ('total' if label else 'item') + str(j)
            anns.append({'box': [5, y, 60, y, 60, y + 10, 5, y + 10],
                         'text': text, 'label': int(label)})
        lines.append({'file_name': f'{i}.jpg', 'height': 100, 'width': 80,
                      'annotations': anns})
        if with_images:
            import cv2
            img = np.zeros((100, 80, 3), np.uint8)
            for j, ann in enumerate(anns):
                if ann['label']:
                    b = ann['box']
                    cv2.rectangle(img, (b[0], b[1]), (b[4], b[5]),
                                  (255, 255, 255), -1)
            cv2.imwrite(str(tmp_path / f'{i}.jpg'), img)
    p = tmp_path / 'kie.jsonl'
    p.write_text('\n'.join(json.dumps(ln) for ln in lines))
    return str(p)


def _write_cluener(tmp_path, n=8):
    lines = []
    for i in range(n):
        text = f'alice went to paris {i}'
        lines.append({'text': text,
                      'label': {'name': {'alice': [[0, 4]]},
                                'address': {'paris': [[14, 18]]}}})
    p = tmp_path / 'ner.jsonl'
    p.write_text('\n'.join(json.dumps(ln) for ln in lines))
    return str(p)


def test_train_kie_sdmgr(tmp_path):
    from tps_pp_tpu.apis.train_kie import train_kie
    from tps_pp_tpu.config import ConfigDict
    from tps_pp_tpu.datasets.kie_dataset import KIEDataset

    ann = _write_wildreceipt(tmp_path)
    ds = KIEDataset(ann, max_nodes=8, max_chars=8)
    cfg = ConfigDict._wrap({
        'model': {'type': 'SDMGR',
                  'head': dict(type='SDMGRHead', num_chars=92,
                               node_embed=32, edge_embed=32, fusion_dim=64,
                               num_classes=4),
                  'loss': dict(type='SDMGRLoss')},
        'optimizer': dict(type='Adam', lr=1e-2),
        'total_epochs': 6,
    })
    variables, history = train_kie(cfg, ds, batch_size=4,
                                   work_dir=str(tmp_path / 'wd'))
    assert all(np.isfinite(history))
    assert history[-1] < history[0] * 0.8, history
    assert (tmp_path / 'wd' / 'epoch_6.npz').exists()


def test_train_kie_sdmgr_visual_modality(tmp_path):
    """visual_modality=True: UNet features RoI-pooled into the node fusion
    (reference sdmgr.py extract_feat + wildreceipt config)."""
    from tps_pp_tpu.apis.train_kie import train_kie
    from tps_pp_tpu.config import ConfigDict
    from tps_pp_tpu.datasets.kie_dataset import KIEDataset

    ann = _write_wildreceipt(tmp_path, with_images=True)
    ds = KIEDataset(ann, max_nodes=8, max_chars=8,
                    img_prefix=str(tmp_path), with_visual=True,
                    img_size=(64, 64))
    item = ds[0]
    assert item['img'].shape == (64, 64, 3)
    assert item['boxes'].shape == (8, 4)
    assert item['boxes'][:4].max() > 0          # scaled into resized coords

    cfg = ConfigDict._wrap({
        'model': {'type': 'SDMGR',
                  'backbone': dict(type='UNet', base_channels=4,
                                   num_stages=3),
                  'visual_modality': True,
                  'head': dict(type='SDMGRHead', num_chars=92,
                               node_embed=32, edge_embed=32, fusion_dim=64,
                               visual_dim=4, num_classes=4),
                  'loss': dict(type='SDMGRLoss')},
        'optimizer': dict(type='Adam', lr=1e-2),
        'total_epochs': 4,
    })
    variables, history = train_kie(cfg, ds, batch_size=4,
                                   work_dir=str(tmp_path / 'wd'))
    assert 'unet' in variables['params']        # visual branch trained
    assert all(np.isfinite(history))
    assert history[-1] < history[0] * 0.9, history


def test_train_ner_bert(tmp_path):
    from tps_pp_tpu.apis.train_kie import train_ner
    from tps_pp_tpu.config import ConfigDict
    from tps_pp_tpu.datasets.kie_dataset import NerDataset

    ann = _write_cluener(tmp_path)
    cats = ['name', 'address']
    ds = NerDataset(ann, categories=cats, max_len=32)
    cfg = ConfigDict._wrap({
        'model': {'type': 'NerClassifier',
                  'encoder': dict(type='BertEncoder', vocab_size=20200,
                                  hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=2,
                                  intermediate_size=64,
                                  max_position_embeddings=64),
                  'decoder': dict(type='FCDecoder',
                                  num_labels=2 * len(cats) + 1),
                  'loss': dict(type='MaskedCrossEntropyLoss')},
        'optimizer': dict(type='Adam', lr=1e-3),
        'total_epochs': 6,
    })
    variables, history = train_ner(cfg, ds, batch_size=4,
                                   work_dir=str(tmp_path / 'wd'))
    assert all(np.isfinite(history))
    assert history[-1] < history[0] * 0.8, history
    assert (tmp_path / 'wd' / 'epoch_6.npz').exists()


@pytest.mark.heavy
def test_train_kie_via_cli(tmp_path):
    """The shipped sdmgr config trains through the tools/train.py dispatch
    (cfg-options shrink it to toy size)."""
    ann = _write_wildreceipt(tmp_path)
    cmd = [sys.executable, 'tools/train.py',
           'configs/kie/sdmgr/sdmgr_unet16_60e_wildreceipt.py',
           '--work-dir', str(tmp_path / 'wd'),
           '--cfg-options',
           f'data.train.ann_file={ann}',
           'data.train.dict_file=',
           'data.train.max_nodes=8', 'data.train.max_chars=8',
           'data.train.with_visual=False',
           'data.samples_per_gpu=4',
           'model.head.node_embed=32', 'model.head.edge_embed=32',
           'model.head.fusion_dim=64',
           'total_epochs=2']
    env = {'JAX_PLATFORMS': 'cpu'}
    import os
    env = {**os.environ, **env}
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=540,
                         cwd='/root/repo', env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    ckpt = tmp_path / 'wd' / 'epoch_2.npz'
    assert ckpt.exists()

    # and evaluate the trained checkpoint through the same CLI
    # (reference routes KIE eval through tools/test.py too)
    cmd = [sys.executable, 'tools/test.py',
           'configs/kie/sdmgr/sdmgr_unet16_60e_wildreceipt.py', str(ckpt),
           '--eval', 'macro_f1',
           '--cfg-options',
           f'data.test.ann_file={ann}',
           'data.test.dict_file=',
           'data.test.max_nodes=8', 'data.test.max_chars=8',
           'data.test.with_visual=False',
           'model.head.node_embed=32', 'model.head.edge_embed=32',
           'model.head.fusion_dim=64',
           "evaluation.metric_options.macro_f1.ignores=[]"]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=540,
                         cwd='/root/repo', env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    assert 'macro_f1' in out.stdout, out.stdout[-1000:]
