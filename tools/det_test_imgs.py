#!/usr/bin/env python
"""Batch detection over an image list: per-image boundary txt files +
visualizations (reference ``tools/det_test_imgs.py:50-120``).

    python tools/det_test_imgs.py IMG_ROOT IMG_LIST CONFIG [CHECKPOINT]
        [--out-dir results] [--batch-size 8] [--score-thr 0.3]

TPU-idiomatic: chunks run through ONE jitted, power-of-two-bucketed
``detect_batch`` call each (the reference loops ``model_inference`` one
image at a time).
"""
import argparse
import logging
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser(description='Batch-test det on images')
    p.add_argument('img_root')
    p.add_argument('img_list')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-dir', default='./results')
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--img-size', type=int, nargs=2, default=None,
                   help='H W of the fixed jitted input (default: config '
                        'img_size or 640 640)')
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import cv2
    import numpy as np

    from tps_pp_tpu.apis.detector import TextDetector
    from tps_pp_tpu.config import load_config
    from tps_pp_tpu.utils.fileio import list_from_file, list_to_file
    from tps_pp_tpu.utils.visualize import imshow_pred_boundary

    cfg = load_config(args.config)
    img_size = tuple(args.img_size or cfg.get('img_size') or (640, 640))
    det = TextDetector(cfg['model'], img_size=img_size,
                       checkpoint=args.checkpoint)

    out_txt = osp.join(args.out_dir, 'out_txt_dir')
    out_vis = osp.join(args.out_dir, 'out_vis_dir')
    for d in (args.out_dir, out_txt, out_vis):
        os.makedirs(d, exist_ok=True)

    files = [ln.strip().split()[0] for ln in list_from_file(args.img_list)
             if ln.strip()]
    total = 0
    for i in range(0, len(files), args.batch_size):
        chunk = files[i:i + args.batch_size]
        imgs = []
        for f in chunk:
            img = cv2.imread(osp.join(args.img_root, f))
            if img is None:
                raise FileNotFoundError(osp.join(args.img_root, f))
            imgs.append(img)
        all_boundaries = det.detect_batch(imgs)
        for f, img, boundaries in zip(chunk, imgs, all_boundaries):
            keep = [b for b in boundaries
                    if float(np.asarray(b)[-1]) > args.score_thr]
            name = osp.splitext('_'.join(f.split('/')))[0]
            list_to_file(
                osp.join(out_txt, name + '.txt'),
                [','.join(str(round(float(x))) for x in b) for b in keep])
            imshow_pred_boundary(img, keep,
                                 out_file=osp.join(out_vis, name + '.jpg'))
            total += len(keep)
    logging.info('%d boundaries over %d images -> %s', total, len(files),
                 args.out_dir)


if __name__ == '__main__':
    main()
