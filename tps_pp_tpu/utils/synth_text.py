"""Synthetic rendered-text crops for training/eval evidence.

With zero egress and no data mounts, memorizing rendered word crops is the
honest end-to-end accuracy stand-in (see ROADMAP.md): the scratch evidence
scripts and the heavy decode-mode parity test share this renderer so the
test pins exactly what the recorded claims measured.
"""
from __future__ import annotations

import numpy as np

# alphanumerics render reliably with the cv2 HERSHEY fonts; all are in
# DICT36/DICT90 so no convertor changes are needed
_CHARS = ('0123456789'
          'abcdefghijklmnopqrstuvwxyz'
          'ABCDEFGHIJKLMNOPQRSTUVWXYZ')


def render_dataset(n: int, seed: int = 0, h: int = 32, w: int = 128,
                   lower: bool = False, max_len: int = 8,
                   length_dist: str = 'uniform'):
    """n synthetic word crops: (imgs float32 (n,h,w,3) in [-1,1], texts).

    cv2.putText over a light background with per-sample font/scale/slant
    jitter — enough visual variety that memorizing the set exercises the
    whole backbone+TPS+encoder+decoder stack, cheap enough to render 4k
    images in seconds on a 1-core host.

    length_dist:
      'uniform' — 3..min(8, max_len) chars (the r1-r4 evidence regime).
      'real' — 1..min(25, max_len) chars from a discretized lognormal
        (median 5, sigma 0.55): the scene-text word-length regime the
        six academic benchmarks actually have. Long words render on a
        proportionally wide canvas and are squeezed to (h, w), exactly
        what the ResizeOCR pipeline stage does to real crops
        (reference transforms.py ResizeOCR / SURVEY §2.6)."""
    import cv2
    rng = np.random.default_rng(seed)
    chars = _CHARS[:36] if lower else _CHARS
    fonts = [cv2.FONT_HERSHEY_SIMPLEX, cv2.FONT_HERSHEY_DUPLEX,
             cv2.FONT_HERSHEY_COMPLEX_SMALL, cv2.FONT_HERSHEY_TRIPLEX]
    imgs = np.empty((n, h, w, 3), np.float32)
    texts = []
    for i in range(n):
        if length_dist == 'real':
            k = int(np.clip(round(rng.lognormal(np.log(5.0), 0.55)),
                            1, min(25, max_len)))
        else:
            k = int(rng.integers(3, min(9, max_len + 1)))
        txt = ''.join(rng.choice(list(chars), size=k))
        bg = int(rng.integers(180, 256))
        # the rng draw ORDER below is load-bearing for 'uniform': the
        # r1-r4 evidence (and the decode-neutrality test's memorized
        # checkpoint regime) pins these exact images — noise(h,w) first,
        # then font/scale/color/x0/y0/thick
        noise = rng.integers(0, 20, (h, w, 3), dtype=np.uint8,
                             endpoint=False)
        font = fonts[int(rng.integers(len(fonts)))]
        scale = float(rng.uniform(0.55, 0.85)) * (h / 32.0)
        color = tuple(int(v) for v in rng.integers(0, 90, 3))
        x0 = int(rng.integers(1, 6))
        y0 = int(rng.integers(20, 27) * h / 32.0)
        thick = 1 + int(rng.integers(0, 2))
        cw = w
        if length_dist == 'real':
            (tw, _), _ = cv2.getTextSize(txt, font, scale, thick)
            cw = max(w, tw + x0 + 4)
            if cw != w:
                noise = rng.integers(0, 20, (h, cw, 3), dtype=np.uint8,
                                     endpoint=False)
        img = np.full((h, cw, 3), bg, np.uint8)
        # mild background noise
        img = cv2.add(img, noise)
        cv2.putText(img, txt, (x0, y0), font, scale, color,
                    thick, cv2.LINE_AA)
        if cw != w:
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
        imgs[i] = img.astype(np.float32) / 127.5 - 1.0
        texts.append(txt)
    return imgs, texts
