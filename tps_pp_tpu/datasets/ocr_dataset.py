"""Recognition datasets + fixed-shape batch iterator.

Re-implements the reference's dataset stack for the recognition task:
  * BaseDataset/OCRDataset — loader + parser + pipeline, gt ``text``
    injection in pre_pipeline, ``evaluate`` via eval_ocr_metric (reference
    ``datasets/base_dataset.py:12-178``, ``ocr_dataset.py:8-36``). The
    reference's pipeline-mutating kd_loss hack (base_dataset.py:70-76) is
    intentionally NOT carried over (SURVEY §7.4), and corrupt samples are
    skipped with the same advance-to-next-index retry (base_dataset.py:
    140-161).
  * UniformConcatDataset — per-benchmark evaluation + mean_ aggregation
    (reference ``uniform_concat_dataset.py:15-151``, minus the data_any.csv
    side-channel).
  * DataLoader — host-side batcher producing fixed-shape NHWC numpy arrays +
    valid_ratio (TPU wants static shapes; the reference's collate+scatter is
    replaced by one device_put of a dense batch).
"""
from __future__ import annotations

import logging
import random as _random
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..evaluation import eval_ocr_metric
from ..registry import DATASETS, LOADERS
from .pipelines.transforms import Compose

logger = logging.getLogger(__name__)


@DATASETS.register_module()
class OCRDataset:
    def __init__(self, ann_file: str = '', loader: Dict = None,
                 pipeline: Sequence = (), img_prefix: str = '',
                 test_mode: bool = False, dataset_info=None, **kwargs):
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        loader = dict(loader or {})
        loader.setdefault('ann_file', ann_file)
        self.data_infos = LOADERS.build(loader)
        self.pipeline = Compose(pipeline)

    def __len__(self):
        return len(self.data_infos)

    def pre_pipeline(self, results: Dict):
        results['img_prefix'] = self.img_prefix
        # inject gt text (reference ocr_dataset.py:11-13)
        results['text'] = results['img_info'].get('text', '')

    def prepare_data(self, index: int) -> Optional[Dict]:
        img_info = self.data_infos[index]
        results = dict(img_info=img_info)
        self.pre_pipeline(results)
        return self.pipeline(results)

    def __getitem__(self, index: int) -> Dict:
        # skip-broken-sample retry loop (reference base_dataset.py:140-161
        # — TRAIN ONLY: substituting the next sample during eval would
        # misalign predictions with evaluate()'s positional ground truths)
        if self.test_mode:
            data = self.prepare_data(index)
            if data is None:
                raise RuntimeError(f'test sample {index} was filtered by '
                                   'the pipeline')
            return data
        for _ in range(len(self)):
            try:
                data = self.prepare_data(index)
                if data is not None:
                    return data
            except Exception as e:  # corrupt image / bad annotation
                logger.warning('skipping sample %d: %s', index, e)
            index = (index + 1) % len(self)
        raise RuntimeError('all samples failed to load')

    def evaluate(self, results: List[Dict], metric='acc', **kwargs) -> Dict:
        gt_texts, pred_texts = [], []
        for i in range(len(self)):
            gt_texts.append(self.data_infos[i]['text'])
            pred_texts.append(results[i]['text'])
        return eval_ocr_metric(pred_texts, gt_texts)


@DATASETS.register_module()
class UniformConcatDataset:
    """Concat of per-benchmark datasets with uniform pipeline assignment and
    mean_ metric aggregation (reference uniform_concat_dataset.py)."""

    def __init__(self, datasets: Sequence, pipeline: Sequence = (),
                 test_mode: bool = False, **kwargs):
        self.datasets: List[OCRDataset] = []
        for ds in datasets:
            ds = dict(ds)
            if pipeline and 'pipeline' not in ds:
                ds['pipeline'] = pipeline
            ds.setdefault('test_mode', test_mode)
            self.datasets.append(DATASETS.build(ds))
        self.cumsizes = np.cumsum([len(d) for d in self.datasets]).tolist()

    def __len__(self):
        return self.cumsizes[-1] if self.cumsizes else 0

    def _locate(self, index: int):
        for di, cum in enumerate(self.cumsizes):
            if index < cum:
                prev = self.cumsizes[di - 1] if di else 0
                return di, index - prev
        raise IndexError(index)

    def __getitem__(self, index: int) -> Dict:
        di, li = self._locate(index)
        return self.datasets[di][li]

    def evaluate(self, results: List[Dict], metric='acc', **kwargs) -> Dict:
        """Per-dataset slices -> per-dataset metrics -> mean_ scores
        (reference uniform_concat_dataset.py:92-151)."""
        assert len(results) == len(self)
        out: Dict[str, float] = {}
        start = 0
        all_metrics: Dict[str, List[float]] = {}
        for ds in self.datasets:
            end = start + len(ds)
            res = ds.evaluate(results[start:end], metric=metric, **kwargs)
            name = getattr(ds.data_infos, 'ann_file', '') or 'dataset'
            for k, v in res.items():
                out[f'{len(ds)}_{name}_{k}'] = v
                all_metrics.setdefault(k, []).append(v)
            start = end
        for k, vals in all_metrics.items():
            out[f'mean_{k}'] = float(f'{np.mean(vals):.4f}')
        return out


_WORKER_DATASET = None


def _worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _collate(samples: List[Dict], batch_size: int,
             pad_to_batch: bool) -> Dict:
    n_real = len(samples)
    if pad_to_batch and n_real < batch_size:
        samples = samples + [samples[-1]] * (batch_size - n_real)
    imgs = np.stack([s['img'] for s in samples]).astype(np.float32,
                                                        copy=False)
    metas = [s['img_metas'] for s in samples]
    vr = np.asarray([m.get('valid_ratio', 1.0) or 1.0 for m in metas],
                    np.float32)
    return {
        'img': imgs,
        'valid_ratio': vr,
        'img_metas': metas,
        'texts': [s.get('text', '') for s in samples],
        'n_real': n_real,
    }


def _worker_fetch(idxs, epoch: int, seed: int, batch_size: int,
                  pad_to_batch: bool):
    """Process AND collate one batch in a worker, seeding the host RNGs per
    (seed, epoch, sample) so augmentation draws are DETERMINISTIC and
    independent of worker count/assignment (stronger than the reference's
    per-worker worker_init_fn seeding, apis/builder.py:155-169). Collating
    worker-side ships ONE contiguous array across the process boundary
    instead of batch_size small per-sample dicts (IPC-bound otherwise)."""
    out = []
    for i in idxs:
        key = (seed * 1000003 + epoch) * 1000003 + int(i)
        _random.seed(key)
        np.random.seed(key % (2 ** 32))
        out.append(_WORKER_DATASET[int(i)])
    return _collate(out, batch_size, pad_to_batch)


class DataLoader:
    """Fixed-shape batcher. Yields dicts of stacked numpy arrays plus
    host-side 'texts' and 'img_metas' lists.

    ``num_workers > 0`` runs the pipeline (decode + augmentation, the CPU
    hot loop — SURVEY §3.1; the reference uses 10 torch workers/GPU) in a
    process pool: whole batches are dispatched ``prefetch`` deep ahead of
    consumption and yielded in order, so the host assembles batch N+k while
    the accelerator runs batch N (the device_put/step overlap comes free
    from JAX async dispatch)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: Optional[int] = None,
                 pad_to_batch: bool = True, num_workers: int = 0,
                 prefetch: int = 2, mp_context: str = 'forkserver'):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.pad_to_batch = pad_to_batch
        self.num_workers = int(num_workers)
        self.prefetch = max(1, int(prefetch))
        self.mp_context = mp_context
        self._pool = None
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _ensure_pool(self):
        if self._pool is None:
            import concurrent.futures as cf
            import multiprocessing as mp
            # default is forkserver: fork from a multi-threaded parent
            # (JAX dispatch threads are already running by now) is
            # deadlock-prone and deprecated in CPython 3.12+. The dataset
            # pickles to each worker; loaders drop live handles on
            # __getstate__ and reopen lazily (loader.py, native.py).
            self._pool = cf.ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=mp.get_context(self.mp_context),
                initializer=_worker_init, initargs=(self.dataset,))
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _batch_indices(self):
        order = list(range(len(self.dataset)))
        if self.shuffle:
            rng = _random.Random(
                (self.seed or 0) * 100003 + self._epoch)
            rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            idxs = order[i:i + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                break
            yield idxs

    def __iter__(self) -> Iterator[Dict]:
        if self.num_workers <= 0:
            # same per-(seed, epoch, sample) seeding as _worker_fetch so
            # augmentation draws are identical at any worker count
            seed = self.seed or 0
            for idxs in self._batch_indices():
                out = []
                for j in idxs:
                    key = (seed * 1000003 + self._epoch) * 1000003 + int(j)
                    _random.seed(key)
                    np.random.seed(key % (2 ** 32))
                    out.append(self.dataset[int(j)])
                yield self.collate(out)
            return
        from collections import deque
        pool = self._ensure_pool()
        seed = self.seed or 0
        pending = deque()
        batches = self._batch_indices()
        depth = self.num_workers * self.prefetch
        try:
            for idxs in batches:
                pending.append(pool.submit(
                    _worker_fetch, idxs, self._epoch, seed,
                    self.batch_size, self.pad_to_batch))
                if len(pending) >= depth:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
        finally:
            for f in pending:
                f.cancel()

    def collate(self, samples: List[Dict]) -> Dict:
        return _collate(samples, self.batch_size, self.pad_to_batch)


def build_dataset(cfg: Dict, default_args: Optional[Dict] = None):
    cfg = dict(cfg)
    if default_args:
        for k, v in default_args.items():
            cfg.setdefault(k, v)
    return DATASETS.build(cfg)
