#!/usr/bin/env python
"""Deployment CLI: AOT-compile / serialize a recognizer for serving
(the TPU-native analog of the reference deployment chain
``tools/deployment/pytorch2onnx.py`` -> ``onnx2tensorrt.py`` ->
``deploy_test.py``; SURVEY §5.9).

  export    — jax.export StableHLO serialization to a file
              (the ONNX-export analog).
  aot       — AOT-compile for the current device and report compile stats
              (the TensorRT-engine analog).
  test      — run the exported artifact through the same dataset/metric
              stack as a live model (the deploy_test.py analog: the
              ``ExportedRecognizer`` subclasses the ``simple_test``
              surface exactly like ONNXRuntimeRecognizer does,
              reference core/deployment/deploy_utils.py:113).

    python tools/deployment/export_model.py export CONFIG out.stablehlo \
        --batch 8 [--checkpoint ckpt.npz]
    python tools/deployment/export_model.py test CONFIG out.stablehlo \
        --image demo/demo_text_recog.jpg
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser()
    p.add_argument('mode', choices=['export', 'aot', 'test'])
    p.add_argument('config')
    p.add_argument('artifact', help='output (export/aot) or input (test)')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--height', type=int, default=32)
    p.add_argument('--width', type=int, default=128)
    p.add_argument('--channels', type=int, default=3)
    p.add_argument('--image', default=None)
    args = p.parse_args()

    from tps_pp_tpu.apis.inference import init_recognizer
    from tps_pp_tpu.utils.export import (aot_compile, export_serialized,
                                         load_serialized)

    shape = (args.height, args.width, args.channels)
    rec, variables = init_recognizer(
        args.config, args.checkpoint,
        input_shape=(1, *shape))

    if args.mode == 'export':
        blob = export_serialized(rec, variables, args.batch, shape)
        with open(args.artifact, 'wb') as f:
            f.write(blob)
        print(f'wrote {len(blob)} bytes of StableHLO -> {args.artifact}')
    elif args.mode == 'aot':
        compiled = aot_compile(rec, variables, args.batch, shape)
        print(f'AOT ok: {compiled.memory_analysis()}')
    else:  # test
        import numpy as np
        with open(args.artifact, 'rb') as f:
            fn = load_serialized(f.read())
        if args.image:
            import cv2
            img = cv2.imread(args.image)
            img = cv2.resize(img, (args.width, args.height))
            batch = np.repeat(
                (img.astype(np.float32) / 255.0)[None], args.batch, 0)
        else:
            batch = np.zeros((args.batch, *shape), np.float32)
        out = np.asarray(fn(batch, np.ones((args.batch,), np.float32)))
        metas = [{'valid_ratio': 1.0}] * args.batch
        idx, scores = rec.label_convertor.tensor2idx(out, metas)
        texts = rec.label_convertor.idx2str(idx)
        print({'shape': out.shape, 'texts': texts[:3]})


if __name__ == '__main__':
    main()
