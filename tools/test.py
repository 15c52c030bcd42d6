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
    model_cfg = cfg['model']
    if model_cfg['type'] == 'SDMGR':
        apply, variables, _ = build_sdmgr_apply(cfg, args.checkpoint, ds[0])
        openset = type(ds).__name__ == 'OpensetKIEDataset'
        results = []
        for i in range(len(ds)):
            item = ds[i]
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
    for i in range(len(ds)):
        item = ds[i]
        logits = apply(variables, jnp.asarray(item['input_ids'])[None],
                       jnp.asarray(item['attention_mask'])[None])
        results.append(np.asarray(logits).argmax(-1)[0])
    return ds.evaluate(results)


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    args = parse_args()

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
        print(json.dumps(metrics, indent=2))
        if args.out:
            with open(args.out, 'w') as f:
                json.dump({'metrics': metrics}, f, indent=2)
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
        batch = args.batch_size or \
            (cfg['data'].get('samples_per_gpu', 8) if 'data' in cfg else 8)
        preds = []
        t0 = time.perf_counter()
        for i in range(0, len(ds), batch):
            imgs = [(ds[j]['img'] * 255).astype('uint8')
                    for j in range(i, min(i + batch, len(ds)))]
            preds.extend(det.detect_batch(imgs))
        dt = time.perf_counter() - t0
        logging.info('det eval: %d images, %.1f ms/image',
                     len(ds), 1e3 * dt / max(len(ds), 1))
        metric = 'hmean-iou' if args.eval in ('acc', 'hmean-iou') \
            else args.eval
        metrics = ds.evaluate(preds, metric=metric)
        print(json.dumps(metrics, indent=2))
        if args.out:
            with open(args.out, 'w') as f:
                json.dump({'metrics': metrics,
                           'results': [[b.tolist() for b in p]
                                       for p in preds]}, f, indent=2)
        return

    rec, variables = init_recognizer(cfg, args.checkpoint)
    test_ds = build_dataset(cfg['data']['test'], dict(test_mode=True))
    batch = args.batch_size or cfg['data'].get('samples_per_gpu', 64)
    metrics, results = eval_recognizer(rec, variables, test_ds,
                                       batch_size=batch, metric=args.eval,
                                       return_results=True)
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({'metrics': metrics, 'results': results}, f, indent=2)


if __name__ == '__main__':
    main()
