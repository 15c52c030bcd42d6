#!/usr/bin/env python
"""Webcam detection demo (reference ``demo/webcam_demo.py``): run a text
detector on a camera stream and draw boundaries live.

    python demo/webcam_demo.py DET_CONFIG [CHECKPOINT] --camera-id 0
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser(description='Webcam text detection demo')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--camera-id', type=int, default=0)
    p.add_argument('--score-thr', type=float, default=0.5)
    args = p.parse_args()

    import cv2
    from tps_pp_tpu.apis.detector import init_detector
    from tps_pp_tpu.utils.visualize import imshow_pred_boundary

    det = init_detector(args.config, args.checkpoint)
    camera = cv2.VideoCapture(args.camera_id)
    if not camera.isOpened():
        raise SystemExit(f'cannot open camera {args.camera_id}')
    print('Press ESC or q to quit.')
    while True:
        ret, img = camera.read()
        if not ret:
            break
        boundaries = [b for b in det.detect(img)
                      if float(b[-1]) >= args.score_thr]
        vis = imshow_pred_boundary(img, boundaries)
        cv2.imshow('tps_pp_tpu webcam demo', vis)
        key = cv2.waitKey(1)
        if key in (27, ord('q')):
            break
    camera.release()
    cv2.destroyAllWindows()


if __name__ == '__main__':
    main()
