"""The batch test-and-visualize CLIs (reference tools/recog_test_imgs.py,
det_test_imgs.py, kie_test_imgs.py) and the closeset->openset converter
(reference tools/data/kie/closeset_to_openset.py)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_train_kie_ner import _write_wildreceipt

_ENV = {**os.environ, 'JAX_PLATFORMS': 'cpu'}


def _write_imgs(tmp_path, n=3, size=(32, 64)):
    import cv2
    files = []
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.uniform(0, 255, size + (3,)).astype(np.uint8)
        f = f'img_{i}.jpg'
        cv2.imwrite(str(tmp_path / f), img)
        files.append(f)
    return files


@pytest.mark.heavy
def test_recog_test_imgs_cli(tmp_path):
    files = _write_imgs(tmp_path)
    (tmp_path / 'list.txt').write_text(
        '\n'.join(f'{f} word{i}' for i, f in enumerate(files)))
    out = subprocess.run(
        [sys.executable, 'tools/recog_test_imgs.py', str(tmp_path),
         str(tmp_path / 'list.txt'),
         'configs/textrecog/crnn/crnn_academic_dataset.py',
         '--out-dir', str(tmp_path / 'res'), '--batch-size', '2'],
        capture_output=True, text=True, timeout=540, cwd='/root/repo',
        env=_ENV)
    assert out.returncode == 0, out.stderr[-3000:]
    res = tmp_path / 'res'
    lines = (res / 'results.txt').read_text().strip().splitlines()
    assert len(lines) == 3
    # every gt label present -> the OCR metric is printed
    assert 'word_acc' in out.stdout, out.stdout[-500:]
    assert len(list((res / 'out_vis_dir').iterdir())) == 3
    correct = len(list((res / 'correct').iterdir()))
    wrong = len(list((res / 'wrong').iterdir()))
    assert correct + wrong == 3


@pytest.mark.heavy
def test_det_test_imgs_cli(tmp_path):
    files = _write_imgs(tmp_path, n=2, size=(64, 96))
    (tmp_path / 'list.txt').write_text('\n'.join(files))
    out = subprocess.run(
        [sys.executable, 'tools/det_test_imgs.py', str(tmp_path),
         str(tmp_path / 'list.txt'),
         'configs/textdet/dbnet/dbnet_r18_fpnc_1200e_icdar2015.py',
         '--out-dir', str(tmp_path / 'res'), '--img-size', '160', '160'],
        capture_output=True, text=True, timeout=540, cwd='/root/repo',
        env=_ENV)
    assert out.returncode == 0, out.stderr[-3000:]
    txts = sorted((tmp_path / 'res' / 'out_txt_dir').iterdir())
    viss = sorted((tmp_path / 'res' / 'out_vis_dir').iterdir())
    assert len(txts) == 2 and len(viss) == 2
    for t in txts:   # random weights: boundary lines (possibly none), csv ints
        for line in t.read_text().strip().splitlines():
            vals = line.split(',')
            assert len(vals) >= 9 and all(v.lstrip('-').isdigit()
                                          for v in vals)


@pytest.mark.heavy
def test_kie_test_imgs_cli(tmp_path):
    ann = _write_wildreceipt(tmp_path)
    out = subprocess.run(
        [sys.executable, 'tools/kie_test_imgs.py',
         'configs/kie/sdmgr/sdmgr_novisual_60e_wildreceipt.py',
         '--out-dir', str(tmp_path / 'res'),
         '--cfg-options', f'data.test.ann_file={ann}',
         'data.test.dict_file=', 'data.test.max_nodes=8',
         'data.test.max_chars=8', 'data.test.with_visual=False',
         'model.head.node_embed=32', 'model.head.edge_embed=32',
         'model.head.fusion_dim=64'],
        capture_output=True, text=True, timeout=540, cwd='/root/repo',
        env=_ENV)
    assert out.returncode == 0, out.stderr[-3000:]
    res = tmp_path / 'res'
    jsons = sorted(res.glob('*.json'))
    jpgs = sorted(res.glob('*.jpg'))
    assert len(jsons) == 8 and len(jpgs) == 8
    recs = json.loads(jsons[0].read_text())
    assert len(recs) == 4
    assert {'text', 'box', 'pred', 'conf'} <= set(recs[0])


def test_closeset_to_openset():
    sys.path.insert(0, '/root/repo/tools/data')
    from closeset_to_openset import convert_line

    anns = [
        {'box': [0, 0, 1, 0, 1, 1, 0, 1], 'text': 'Store', 'label': 2},
        {'box': [0, 0, 1, 0, 1, 1, 0, 1], 'text': 'ACME', 'label': 1},
        {'box': [0, 0, 1, 0, 1, 1, 0, 1], 'text': 'junk', 'label': 0},
        {'box': [0, 0, 1, 0, 1, 1, 0, 1], 'text': 'misc', 'label': 25},
    ]
    line = json.dumps({'file_name': 'x.jpg', 'height': 10, 'width': 10,
                       'annotations': anns})
    out = json.loads(convert_line(line))
    labels = [a['label'] for a in out['annotations']]
    edges = [a['edge'] for a in out['annotations']]
    # key=1 / value=2; the (2, 1) closeset pair shares one edge id
    assert labels[0] == 1 and labels[1] == 2
    assert edges[0] == edges[1]
    # bg and others get fresh edge ids of their own
    assert labels[2] == 0 and labels[3] == 3
    assert len({edges[2], edges[3], edges[0]}) == 3
    # --merge folds others into bg
    out2 = json.loads(convert_line(line, merge_bg_others=True))
    assert out2['annotations'][3]['label'] == 0
