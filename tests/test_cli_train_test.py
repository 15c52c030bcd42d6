"""The recog train/eval CLIs driven end-to-end as subprocesses
(the reference's primary workflow: tools/train.py then tools/test.py —
README.md:61-65; the KIE CLI has its own drive in test_train_kie_ner)."""
import json
import os
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.heavy, pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_train_then_test_cli(tmp_path):
    wd = str(tmp_path / 'work')
    r = _run(['tools/train.py', 'configs/textrecog/crnn/crnn_toy_dataset.py',
              '--work-dir', wd, '--seed', '0',
              '--cfg-options', 'total_epochs=2', 'data.samples_per_gpu=8'])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    ckpts = [f for f in os.listdir(wd) if 'ckpt' in f or 'step' in f
             or f.endswith('.orbax')] or os.listdir(wd)
    assert ckpts, f'no checkpoint in {wd}: {os.listdir(wd)}'

    r2 = _run(['tools/test.py', 'configs/textrecog/crnn/crnn_toy_dataset.py',
               wd, '--eval', 'acc', '--out', str(tmp_path / 'res.json')])
    assert r2.returncode == 0, r2.stdout[-3000:] + r2.stderr[-3000:]
    out_file = tmp_path / 'res.json'
    assert out_file.exists()
    blob = json.loads(out_file.read_text())
    assert blob, 'empty eval output'
