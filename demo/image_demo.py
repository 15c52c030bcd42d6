#!/usr/bin/env python
"""Single-image detection demo (reference ``demo/image_demo.py``).

    python demo/image_demo.py IMG DET_CONFIG [CHECKPOINT] --out-file out.jpg
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser(description='Text detection demo')
    p.add_argument('img')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-file', default='demo/det_out.jpg')
    p.add_argument('--img-size', type=int, nargs=2, default=(640, 640))
    args = p.parse_args()

    import cv2
    from tps_pp_tpu.apis.detector import init_detector
    from tps_pp_tpu.utils.visualize import imshow_pred_boundary

    det = init_detector(args.config, args.checkpoint,
                        img_size=tuple(args.img_size))
    img = cv2.imread(args.img)
    boundaries = det.detect(img)
    print(f'{len(boundaries)} text instances')
    imshow_pred_boundary(img, boundaries, out_file=args.out_file)
    print(f'saved {args.out_file}')


if __name__ == '__main__':
    main()
