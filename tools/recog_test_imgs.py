#!/usr/bin/env python
"""Batch recognition over an image list, with per-image visualization and
correct/wrong triage (reference ``tools/recog_test_imgs.py:40-123``).

    python tools/recog_test_imgs.py IMG_ROOT IMG_LIST CONFIG [CHECKPOINT]
        [--out-dir results] [--batch-size 32]

``IMG_LIST`` lines are ``<relative path> [<gt label>]``. Unlike the
reference's per-image ``model_inference`` loop, images run through ONE
batched (power-of-two bucketed) device forward per chunk — per-image
dispatch would waste the chip. When every line carries a ground-truth
label, the reference OCR metric is printed at the end.
"""
import argparse
import logging
import os
import os.path as osp
import shutil
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser(description='Batch-test recog on images')
    p.add_argument('img_root_path')
    p.add_argument('img_list')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-dir', default='./results')
    p.add_argument('--batch-size', type=int, default=32)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import numpy as np  # noqa: F401  (cv2 loaders return ndarrays)

    from tps_pp_tpu.apis.inference import init_recognizer, model_inference
    from tps_pp_tpu.evaluation.ocr_metric import eval_ocr_metric
    from tps_pp_tpu.utils.fileio import list_from_file, list_to_file
    from tps_pp_tpu.utils.visualize import imshow_text_label

    rec, variables = init_recognizer(args.config, args.checkpoint)

    out_vis = osp.join(args.out_dir, 'out_vis_dir')
    correct_vis = osp.join(args.out_dir, 'correct')
    wrong_vis = osp.join(args.out_dir, 'wrong')
    for d in (args.out_dir, out_vis, correct_vis, wrong_vis):
        os.makedirs(d, exist_ok=True)

    img_files, gt_labels = [], []
    for line in list_from_file(args.img_list):
        items = line.strip().split()
        if not items:
            continue
        img_files.append(items[0])
        gt_labels.append(items[1] if len(items) >= 2 else '')

    pred_labels = []
    for i in range(0, len(img_files), args.batch_size):
        chunk = img_files[i:i + args.batch_size]
        paths = [osp.join(args.img_root_path, f) for f in chunk]
        for pth in paths:
            if not osp.exists(pth):
                raise FileNotFoundError(pth)
        results = model_inference(rec, variables, paths, batch_mode=True)
        if isinstance(results, dict):
            results = [results]
        pred_labels.extend(r['text'] for r in results)
    assert len(pred_labels) == len(img_files)

    import cv2
    for img_file, pred, gt in zip(img_files, pred_labels, gt_labels):
        out_name = '_'.join(img_file.split('/'))
        out_file = osp.join(out_vis, out_name)
        img = cv2.imread(osp.join(args.img_root_path, img_file))
        vis = imshow_text_label(img, pred, gt, out_file=out_file)
        del vis
        if gt:
            dst = correct_vis if gt == pred else wrong_vis
            shutil.copy(out_file, osp.join(dst, out_name))

    lines = [f'{osp.join(args.img_root_path, f)} {pr} {gt}'
             for f, pr, gt in zip(img_files, pred_labels, gt_labels)]
    list_to_file(osp.join(args.out_dir, 'results.txt'), lines)
    list_to_file(osp.join(args.out_dir, 'correct.txt'),
                 [ln for ln, pr, gt in zip(lines, pred_labels, gt_labels)
                  if gt and pr == gt])
    list_to_file(osp.join(args.out_dir, 'wrong.txt'),
                 [ln for ln, pr, gt in zip(lines, pred_labels, gt_labels)
                  if gt and pr != gt])

    if all(gt_labels) and gt_labels:
        metrics = eval_ocr_metric(pred_labels, gt_labels)
        logging.info('eval on %d images: %s', len(gt_labels), metrics)
        print(metrics)


if __name__ == '__main__':
    main()
