#!/usr/bin/env python
"""End-to-end det + recog demo (reference ``demo/ocr_image_demo.py``).

    python demo/ocr_image_demo.py IMG --det-config CFG --recog-config CFG \
        [--det-ckpt CKPT] [--recog-ckpt CKPT] --out-file demo/ocr_out.jpg
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser(description='End-to-end OCR demo')
    p.add_argument('img')
    p.add_argument('--det-config',
                   default='configs/textdet/dbnet/'
                           'dbnet_r18_fpnc_1200e_icdar2015.py')
    p.add_argument('--recog-config',
                   default='configs/textrecog/nrtr/nrtr_tps++.py')
    p.add_argument('--det-ckpt', default=None)
    p.add_argument('--recog-ckpt', default=None)
    p.add_argument('--out-file', default='demo/ocr_out.jpg')
    args = p.parse_args()

    import cv2
    from tps_pp_tpu.apis.ocr import MMOCR
    from tps_pp_tpu.utils.visualize import det_recog_show_result

    ocr = MMOCR(det_config=args.det_config, recog_config=args.recog_config,
                det_ckpt=args.det_ckpt, recog_ckpt=args.recog_ckpt)
    results = ocr.readtext(args.img, details=True)
    res = results[0]
    for r in res.get('result', []):
        print(f"  {r.get('text', '')!r}  score={r.get('text_score', 0):.3f}")
    det_recog_show_result(cv2.imread(args.img), res,
                          out_file=args.out_file)
    print(f'saved {args.out_file}')


if __name__ == '__main__':
    main()
