#!/usr/bin/env python
"""Evaluation CLI (reference ``tools/test.py``).

    python tools/test.py CONFIG [CHECKPOINT] --eval acc [--out results.json]
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description='Evaluate a text recognizer')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--eval', default='acc')
    p.add_argument('--out', default=None)
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def _maybe_init_distributed():
    """Multi-host eval: one process per host, sharded work, gathered
    results. Same gate as tools/train.py (see
    :func:`tps_pp_tpu.utils.platform.maybe_init_distributed`)."""
    from tps_pp_tpu.utils.platform import maybe_init_distributed
    maybe_init_distributed()


class _ShardView:
    """Strided per-process shard of a dataset (rank, rank+P, rank+2P, ...).

    The reference shards its test DataLoader by rank and gathers results
    with ``collect_results_gpu`` (pickle -> cuda tensor -> all_gather,
    mmcv/engine/test.py); here the shard is a plain index view and the
    gather rides ``jax.experimental.multihost_utils`` over ICI
    (:func:`_collect_results`). Global metrics are computed post-gather, so
    per-shard ``evaluate`` is a stub.
    """

    def __init__(self, ds, rank: int, world: int):
        self.ds = ds
        self.indices = range(rank, len(ds), world)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.ds[self.indices[i]]

    def evaluate(self, results, **kwargs):
        return {}


def _interleave(per_rank, n_total: int):
    """Restore dataset order from strided per-rank result lists."""
    out = [None] * n_total
    for r, res in enumerate(per_rank):
        for j, item in enumerate(res):
            out[r + j * len(per_rank)] = item
    assert all(x is not None for x in out)
    return out


def _collect_results(shard_results, n_total: int):
    """All-gather per-process result lists and restore dataset order.

    The jax-native analog of the reference's ``collect_results_gpu``:
    pickle -> uint8 array -> pad to the max size -> process_allgather over
    ICI -> unpickle each rank's slice -> interleave. Every process returns
    the full ordered list (metrics are then computed identically
    everywhere; only rank 0 prints/writes).
    """
    import pickle

    import jax
    import numpy as np

    if jax.process_count() == 1:
        return shard_results
    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(shard_results), np.uint8)
    sizes = np.asarray(multihost_utils.process_allgather(
        np.asarray([buf.size], np.int64))).reshape(-1)
    padded = np.zeros((int(sizes.max()),), np.uint8)
    padded[:buf.size] = buf
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    per_rank = [pickle.loads(gathered[r, :int(sizes[r])].tobytes())
                for r in range(jax.process_count())]
    return _interleave(per_rank, n_total)


def _rank0() -> bool:
    import jax
    return jax.process_index() == 0


def _report(metrics, args, results=None, extra=None):
    """Print metrics and write ``--out`` — rank 0 only (all ranks hold
    identical post-gather metrics; concurrent writes would corrupt the
    file)."""
    if not _rank0():
        return
    print(json.dumps(metrics, indent=2))
    if args.out:
        payload = {'metrics': metrics}
        if results is not None:
            payload['results'] = results
        if extra:
            payload.update(extra)
        with open(args.out, 'w') as f:
            json.dump(payload, f, indent=2)


def _eval_kie_ner(cfg, args):
    """KIE (SDMGR macro-F1) / NER (entity F1) evaluation — the reference
    routes both through this same CLI (kie forward_test -> node softmax,
    ner classifier -> per-token tags)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tps_pp_tpu.apis.train_kie import (_build, build_sdmgr_apply,
                                           build_task_dataset)
    from tps_pp_tpu.registry import ENCODERS, HEADS
    from tps_pp_tpu.utils.checkpoint import load_variables

    ds = build_task_dataset(cfg, 'test')
    shard = _ShardView(ds, jax.process_index(), jax.process_count())
    model_cfg = cfg['model']
    if model_cfg['type'] == 'SDMGR':
        apply, variables, _ = build_sdmgr_apply(cfg, args.checkpoint, ds[0])
        openset = type(ds).__name__ == 'OpensetKIEDataset'
        results = []
        for i in range(len(shard)):
            item = shard[i]
            node_cls, edge_cls = apply(variables, item)
            if openset:   # kv-pair decode expects softmaxed node/edge maps
                n = int((item['labels'] != -100).sum())
                N = len(item['labels'])
                edges = np.asarray(jax.nn.softmax(edge_cls, -1)).reshape(
                    N, N, 2)[:n, :n, 1]
                results.append({
                    'filename': item['filename'],
                    'nodes': np.asarray(jax.nn.softmax(node_cls, -1))[:n],
                    'edges': edges,
                })
            else:
                results.append(np.asarray(node_cls).argmax(-1))
        results = _collect_results(results, len(ds))
        opts = (cfg.get('evaluation', {}).get('metric_options', {})
                .get('macro_f1', {}))
        return ds.evaluate(results, metric=args.eval, **opts)
    # NER
    from tps_pp_tpu.models.ner.bert import NerClassifierModule
    module = NerClassifierModule(
        encoder=_build(ENCODERS, model_cfg['encoder']),
        decoder=_build(HEADS, model_cfg['decoder']))
    T = ds[0]['input_ids'].shape[0]
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, T), jnp.int32))
    if args.checkpoint:
        variables = load_variables(args.checkpoint, variables)
    apply = jax.jit(lambda v, i, m: module.apply(v, i, m))
    results = []
    for i in range(len(shard)):
        item = shard[i]
        logits = apply(variables, jnp.asarray(item['input_ids'])[None],
                       jnp.asarray(item['attention_mask'])[None])
        results.append(np.asarray(logits).argmax(-1)[0])
    results = _collect_results(results, len(ds))
    return ds.evaluate(results)


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    args = parse_args()
    _maybe_init_distributed()

    import ast

    from tps_pp_tpu.config import load_config, merge_cli_options
    from tps_pp_tpu.apis.inference import init_recognizer
    from tps_pp_tpu.apis.test import eval_recognizer
    from tps_pp_tpu.datasets import build_dataset

    cfg = load_config(args.config)
    options = {}
    for kv in args.cfg_options:
        k, v = kv.split('=', 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        options[k] = v
    merge_cli_options(cfg, options)

    from tps_pp_tpu.apis.train_kie import (KIE_TYPES, NER_TYPES,
                                           build_task_dataset)
    if cfg['model'].get('type') in KIE_TYPES + NER_TYPES:
        metrics = _eval_kie_ner(cfg, args)
        _report(metrics, args)
        return

    from tps_pp_tpu.apis.train_det import DET_TYPES
    if cfg['model'].get('type') in DET_TYPES:
        # detection eval: detect every test image, score with hmean
        # (reference runs det configs through the same tools/test.py)
        from tps_pp_tpu.apis.detector import TextDetector
        from tps_pp_tpu.datasets import TextDetDataset
        d = dict(cfg['data']['test']) if 'data' in cfg else {}
        d.pop('type', None)
        d['test_mode'] = True
        ds = TextDetDataset(**d)
        det = TextDetector(cfg['model'],
                           img_size=tuple(cfg.get('det_img_size',
                                                  (640, 640))),
                           checkpoint=args.checkpoint)
        # fixed-size resized batches through the jitted detector forward,
        # host postprocessing per image (reference single_gpu_test batching)
        import time

        import jax
        batch = args.batch_size or \
            (cfg['data'].get('samples_per_gpu', 8) if 'data' in cfg else 8)
        shard = _ShardView(ds, jax.process_index(), jax.process_count())
        preds = []
        t0 = time.perf_counter()
        for i in range(0, len(shard), batch):
            imgs = [(shard[j]['img'] * 255).astype('uint8')
                    for j in range(i, min(i + batch, len(shard)))]
            preds.extend(det.detect_batch(imgs))
        dt = time.perf_counter() - t0
        logging.info('det eval: %d images, %.1f ms/image',
                     len(shard), 1e3 * dt / max(len(shard), 1))
        preds = _collect_results(preds, len(ds))
        metric = 'hmean-iou' if args.eval in ('acc', 'hmean-iou') \
            else args.eval
        metrics = ds.evaluate(preds, metric=metric)
        _report(metrics, args,
                results=[[b.tolist() for b in p] for p in preds])
        return

    import jax
    rec, variables = init_recognizer(cfg, args.checkpoint)
    test_ds = build_dataset(cfg['data']['test'], dict(test_mode=True))
    batch = args.batch_size or cfg['data'].get('samples_per_gpu', 64)
    if jax.process_count() > 1:
        # each process evaluates a strided shard, results are gathered over
        # ICI, and the full metric is computed identically on every host
        shard = _ShardView(test_ds, jax.process_index(), jax.process_count())
        _, results = eval_recognizer(rec, variables, shard,
                                     batch_size=batch, metric=args.eval,
                                     return_results=True)
        results = _collect_results(results, len(test_ds))
        metrics = test_ds.evaluate(results, metric=args.eval)
    else:
        # single process, multiple local chips: shard eval batches over a
        # data-only mesh (the v5e-8 serving layout; reference analog is
        # MMDataParallel over local GPUs, tools/test.py:197)
        mesh = None
        if len(jax.devices()) > 1:
            from tps_pp_tpu.parallel import create_mesh
            mesh = create_mesh(model=1)
            n = mesh.shape['data']
            if batch % n:   # shard_batch needs a divisible batch
                batch = ((batch + n - 1) // n) * n
            logging.info('eval sharded over %d-device data mesh (batch %d)',
                         mesh.shape['data'], batch)
        metrics, results = eval_recognizer(rec, variables, test_ds,
                                           batch_size=batch, mesh=mesh,
                                           metric=args.eval,
                                           return_results=True)
    _report(metrics, args, results=results)


if __name__ == '__main__':
    main()
