#!/usr/bin/env python
"""Model-serving endpoint: the TPU-native analog of the reference TorchServe
packaging (``tools/deployment/mmocr2torchserve.py`` + ``mmocr_handler.py``,
SURVEY §5.9).

Serves a recognizer or detector config over HTTP with the TorchServe wire
conventions the reference handler implements (MMOCRHandler.preprocess
accepts raw or base64 image bytes; mmocr_handler.py:33-47):

  GET  /ping                      -> {"status": "Healthy"}
  POST /predictions/<model_name>  -> body = image bytes (or base64 text)
                                     -> JSON inference result

    python tools/deployment/serve_model.py CONFIG --port 8080 \
        [--checkpoint ckpt.npz] [--name ocr] [--det]

Stdlib http.server only — no serving framework dependency; the jitted model
is shared across requests (compile once, serve many).
"""
import argparse
import base64
import binascii
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def _decode_image(body: bytes):
    import cv2
    import numpy as np
    if not body:
        return None
    # the reference handler accepts base64 strings too (mmocr_handler.py:38)
    try:
        text = body.decode('ascii').strip()
        if text and all(c in ('ABCDEFGHIJKLMNOPQRSTUVWXYZ'
                              'abcdefghijklmnopqrstuvwxyz0123456789+/=\n')
                        for c in text[:64]):
            body = base64.b64decode(text, validate=True)
    except (UnicodeDecodeError, binascii.Error, ValueError):
        pass
    img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    return img


class _Model:
    """Loads the model once; thread-safe inference (jax dispatch is)."""

    def __init__(self, config, checkpoint=None, det=False):
        self.det = det
        self.lock = threading.Lock()
        if det:
            from tps_pp_tpu.apis.detector import init_detector
            self.detector = init_detector(config, checkpoint)
        else:
            from tps_pp_tpu.apis.inference import (init_recognizer,
                                                   model_inference)
            self.rec, self.variables = init_recognizer(config, checkpoint)
            self._infer = model_inference

    def predict(self, img):
        with self.lock:
            if self.det:
                boundaries = self.detector.detect(img)
                return {'boundary_result': [list(map(float, b))
                                            for b in boundaries]}
            out = self._infer(self.rec, self.variables, img)
            return {'text': out['text'], 'score': float(np.mean(out['score']))
                    if hasattr(out['score'], '__len__') else
                    float(out['score'])}


def make_handler(model: _Model, name: str):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode('utf-8')
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/ping':
                self._send(200, {'status': 'Healthy'})
            else:
                self._send(404, {'error': f'unknown path {self.path}'})

        def do_POST(self):
            if self.path != f'/predictions/{name}':
                self._send(404, {'error': f'unknown model path {self.path}; '
                                          f'expected /predictions/{name}'})
                return
            length = int(self.headers.get('Content-Length', 0))
            img = _decode_image(self.rfile.read(length))
            if img is None:
                self._send(400, {'error': 'request body is not a decodable '
                                          'image (raw or base64 bytes)'})
                return
            try:
                self._send(200, model.predict(img))
            except Exception as e:  # noqa: BLE001 — serving boundary
                self._send(500, {'error': repr(e)})

        def log_message(self, fmt, *args):  # quiet access log
            sys.stderr.write('serve: %s\n' % (fmt % args))

    return Handler


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--port', type=int, default=8080)
    p.add_argument('--name', default='ocr')
    p.add_argument('--det', action='store_true',
                   help='serve a detection config instead of recognition')
    args = p.parse_args()

    model = _Model(args.config, args.checkpoint, det=args.det)
    server = ThreadingHTTPServer(('127.0.0.1', args.port),
                                 make_handler(model, args.name))
    print(f'serving {args.config} at '
          f'http://127.0.0.1:{args.port}/predictions/{args.name}',
          flush=True)
    server.serve_forever()


if __name__ == '__main__':
    main()
