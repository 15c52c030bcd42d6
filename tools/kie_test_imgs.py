#!/usr/bin/env python
"""Run SDMGR over a KIE test set and save per-image prediction JSONs +
node/edge visualizations (reference ``tools/kie_test_imgs.py:20-49``
``save_results`` + ``model.show_result``).

    python tools/kie_test_imgs.py CONFIG [CHECKPOINT] [--out-dir results]
        [--cfg-options k=v ...]

Each image gets ``<name>.json`` with per-box ``{text, box, pred, conf}``
and ``<name>.jpg`` from ``imshow_edge`` (boxes colored by node class,
decoded key->value pairs in a side panel). Raw texts/quads come from the
annotation lines; the rendered image falls back to a white canvas when
the image file is absent (annotation-only runs).
"""
import argparse
import ast
import json
import logging
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser(description='Visualize KIE predictions')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-dir', default='./results')
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import cv2
    import numpy as np
    import jax

    from tps_pp_tpu.apis.train_kie import build_sdmgr_apply, \
        build_task_dataset
    from tps_pp_tpu.config import load_config, merge_cli_options
    from tps_pp_tpu.utils.visualize import imshow_edge

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

    ds = build_task_dataset(cfg, 'test')
    apply, variables, _ = build_sdmgr_apply(cfg, args.checkpoint, ds[0])
    os.makedirs(args.out_dir, exist_ok=True)

    for i in range(len(ds)):
        item = ds[i]
        node_cls, edge_cls = apply(variables, item)
        line = ds.lines[i]
        anns = line['annotations'][:node_cls.shape[0]]
        n = len(anns)
        nodes = np.asarray(jax.nn.softmax(node_cls, -1))[:n]
        N = node_cls.shape[0]
        edges = np.asarray(jax.nn.softmax(edge_cls, -1)).reshape(
            N, N, -1)[:n, :n, -1]
        texts = [str(a.get('text', '')) for a in anns]
        boxes = [np.asarray(a['box'], np.float32).reshape(-1) for a in anns]
        name = osp.splitext(osp.basename(
            str(line.get('file_name') or f'sample_{i}')))[0]
        json_result = [{
            'text': t,
            'box': [float(x) for x in b],
            'pred': int(nd.argmax(-1)),
            'conf': float(nd.max(-1)),
        } for t, b, nd in zip(texts, boxes, nodes)]
        with open(osp.join(args.out_dir, name + '.json'), 'w') as f:
            json.dump(json_result, f, ensure_ascii=False)

        img = None
        if line.get('file_name'):
            img = cv2.imread(osp.join(
                getattr(ds, 'img_prefix', '') or '', line['file_name']))
        if img is None:   # annotation-only: draw on a white canvas
            pts = (np.concatenate(boxes).reshape(-1, 2) if boxes
                   else np.zeros((1, 2)))
            h = int(line.get('height') or pts[:, 1].max() + 16 or 256)
            w = int(line.get('width') or pts[:, 0].max() + 16 or 256)
            img = np.full((max(h, 32), max(w, 32), 3), 255, np.uint8)
        imshow_edge(img, boxes, texts, nodes, edges,
                    out_file=osp.join(args.out_dir, name + '.jpg'))
    logging.info('saved %d predictions -> %s', len(ds), args.out_dir)


if __name__ == '__main__':
    main()
