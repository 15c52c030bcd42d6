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
    return p.parse_args()


def main():
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    args = parse_args()

    from tps_pp_tpu.config import load_config
    from tps_pp_tpu.apis.inference import init_recognizer
    from tps_pp_tpu.apis.test import eval_recognizer
    from tps_pp_tpu.datasets import build_dataset

    cfg = load_config(args.config)

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
