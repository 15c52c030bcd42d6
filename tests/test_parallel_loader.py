"""Multi-worker prefetching DataLoader (reference runs 10 torch dataloader
workers per GPU because the augmentation pipeline is the CPU hot loop —
apis/builder.py:117-152, SURVEY §3.1)."""
import os

import numpy as np
import pytest

from tps_pp_tpu.datasets import build_dataset
from tps_pp_tpu.datasets.ocr_dataset import DataLoader

TOY = os.path.join(os.path.dirname(__file__), 'data/ocr_toy_dataset')


def _toy_ds(with_aug: bool):
    aug = ([dict(type='RandomPaddingOCR', max_ratio=[0.2, 0.2, 0.2, 0.2])]
           if with_aug else [])
    return build_dataset(dict(
        type='OCRDataset', img_prefix=TOY,
        ann_file=os.path.join(TOY, 'label.txt'),
        loader=dict(type='HardDiskLoader',
                    parser=dict(type='LineStrParser',
                                keys=['filename', 'text'],
                                keys_idx=[0, 1], separator=' ')),
        pipeline=[dict(type='LoadImageFromFile', color_type='grayscale')] +
        aug +
        [dict(type='ResizeOCR', height=32, min_width=100, max_width=100,
              keep_aspect_ratio=False),
         dict(type='ToTensorOCR'),
         dict(type='NormalizeOCR', mean=[0.5], std=[0.5]),
         dict(type='Collect', keys=['img'])],
        test_mode=False))


def _drain(loader):
    out = []
    for b in loader:
        out.append((b['img'].copy(), tuple(b['texts']), b['n_real']))
    return out


def test_worker_loader_matches_across_worker_counts():
    """Batches are deterministic and independent of worker count (per-sample
    folded seeds, not per-worker ones)."""
    ds = _toy_ds(with_aug=True)
    ref = None
    for workers in (1, 3):
        loader = DataLoader(ds, 4, shuffle=True, seed=7,
                            num_workers=workers)
        loader.set_epoch(2)
        got = _drain(loader)
        loader.close()
        if ref is None:
            ref = got
            continue
        assert len(got) == len(ref)
        for (ia, ta, na), (ib, tb, nb) in zip(ref, got):
            assert ta == tb and na == nb
            np.testing.assert_array_equal(ia, ib)


def test_worker_loader_epoch_changes_augmentation():
    ds = _toy_ds(with_aug=True)
    loader = DataLoader(ds, 4, shuffle=False, seed=7, num_workers=2)
    loader.set_epoch(0)
    a = _drain(loader)
    loader.set_epoch(1)
    b = _drain(loader)
    loader.close()
    assert any(not np.array_equal(x[0], y[0]) for x, y in zip(a, b))


def test_worker_loader_same_samples_as_sync():
    """Without random augmentation the worker path yields exactly the sync
    path's batches (ordering + collation parity)."""
    ds = _toy_ds(with_aug=False)
    sync = DataLoader(ds, 4, shuffle=True, seed=3)
    par = DataLoader(ds, 4, shuffle=True, seed=3, num_workers=2)
    a, b = _drain(sync), _drain(par)
    par.close()
    assert len(a) == len(b)
    for (ia, ta, na), (ib, tb, nb) in zip(a, b):
        assert ta == tb and na == nb
        np.testing.assert_array_equal(ia, ib)
