"""Evaluation loop (reference ``apis/test.py:63-161`` single_gpu_test and the
multi_gpu_test gather at tools/test.py:206-207).

TPU framing: batches are fixed-shape and sharded over the mesh's 'data' axis
(the reference shards the DataLoader across ranks and all_gathers results);
decode scores come back to the host once per batch, string decoding and the
word-accuracy metric stay host-side for byte-parity with the reference
protocol (ocr_metric.py). Per-image timing is reported like the reference's
'ms per images' print (apis/test.py:159-160).
"""
from __future__ import annotations

import logging
import time
from typing import Dict, List, Optional

import numpy as np

from ..datasets.ocr_dataset import DataLoader

logger = logging.getLogger('tps_pp_tpu')


def eval_recognizer(rec, variables, dataset, batch_size: int = 64,
                    mesh=None, metric: str = 'acc',
                    return_results: bool = False):
    """Run the full test path over a dataset and compute its metrics.

    Test-time augmentation: when the test pipeline contains
    ``MultiRotateAugOCR`` and batch_size == 1, every rotation variant runs
    through the recognizer and ``merge_aug_results`` keeps the best
    hypothesis (reference applies TTA in every recog test pipeline with
    samples_per_gpu=1, and strips it when batch > 1 —
    apis/utils.py:61-98); at batch > 1 the variants are ignored here too.
    """
    import jax
    from ..parallel import shard_batch

    if batch_size == 1 and len(dataset):
        probe = dataset[0]
        if 'aug_imgs' in probe:
            # TTA runs variant mini-batches of one image: a device mesh
            # cannot shard those, so it is deliberately not forwarded
            return _eval_recognizer_tta(rec, variables, dataset, probe,
                                        metric, return_results)

    loader = DataLoader(dataset, batch_size, shuffle=False,
                        pad_to_batch=True)
    results: List[Dict] = []
    total_time = 0.0
    n_images = 0
    for host_batch in loader:
        img = host_batch['img']
        vr = host_batch['valid_ratio']
        if mesh is not None:
            placed = shard_batch({'img': img, 'valid_ratio': vr}, mesh)
            img, vr = placed['img'], placed['valid_ratio']
        t0 = time.perf_counter()
        # pad_to_batch already fixes the shape: no bucketing (it would
        # pad a constant batch of e.g. 100 to 128 on every step); the mesh
        # routes through shard_map (the fused Pallas paths cannot be
        # auto-partitioned)
        out = rec.predict(variables, img, vr, bucket_batch=False, mesh=mesh)
        out = np.asarray(out)
        total_time += time.perf_counter() - t0
        n_real = host_batch['n_real']
        metas = host_batch['img_metas'][:n_real]
        idxs, scores = rec.label_convertor.tensor2idx(out[:n_real], metas)
        strings = rec.label_convertor.idx2str(idxs)
        results.extend(dict(text=s, score=sc)
                       for s, sc in zip(strings, scores))
        n_images += n_real
    if n_images:
        logger.info('%.2f ms per image (%d images)',
                    1000.0 * total_time / n_images, n_images)
    metrics = dataset.evaluate(results, metric=metric)
    if return_results:
        return metrics, results
    return metrics


def _eval_recognizer_tta(rec, variables, dataset, probe, metric: str,
                         return_results: bool):
    """batch=1 TTA loop: the (padded) rotation variants of each image run as
    one fixed-shape mini-batch, each hypothesis is decoded, and the best
    mean-score one wins (reference merge_aug_results,
    encode_decode_recognizer.py:227-236)."""
    import jax.numpy as jnp
    from ..datasets.pipelines.test_time_aug import merge_aug_results

    n_var = int(probe.get('aug_total', 1))
    results: List[Dict] = []
    total_time = 0.0
    for i in range(len(dataset)):
        item = dataset[i]
        imgs = list(item.get('aug_imgs') or [item['img']])
        metas = list(item.get('aug_metas') or
                     [item.get('img_metas', {})] * len(imgs))
        n_real = len(imgs)
        # pad to the fixed variant count so every image compiles one shape
        while len(imgs) < n_var:
            imgs.append(imgs[0])
            metas.append(metas[0])
        vr = np.asarray([m.get('valid_ratio', 1.0) or 1.0 for m in metas],
                        np.float32)
        t0 = time.perf_counter()
        out = np.asarray(rec.predict(variables,
                                     jnp.asarray(np.stack(imgs),
                                                 jnp.float32), vr,
                                     bucket_batch=False))
        total_time += time.perf_counter() - t0
        idxs, scores = rec.label_convertor.tensor2idx(out[:n_real],
                                                      metas[:n_real])
        strings = rec.label_convertor.idx2str(idxs)
        results.append(merge_aug_results(
            [dict(text=s, score=sc) for s, sc in zip(strings, scores)]))
    if len(dataset):
        logger.info('%.2f ms per image (%d images, TTA x%d)',
                    1000.0 * total_time / len(dataset), len(dataset), n_var)
    metrics = dataset.evaluate(results, metric=metric)
    if return_results:
        return metrics, results
    return metrics
