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
    """Run the full test path over a dataset and compute its metrics."""
    import jax
    from ..parallel import shard_batch

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
        out = rec.predict(variables, img, vr)
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
