"""Shared helpers for the scratch evidence scripts.

These scripts back the perf/accuracy claims in ROADMAP.md: a synthetic
rendered-text dataset (zero egress / no data mounts, so memorization on
rendered text is the honest stand-in for real-data training), fp32->bf16
flagship training, checkpoint save/load, and an axon-tunnel-robust timing
harness (same inner-scan trick as bench.py — per-dispatch tunnel latency
must not be billed to the chip).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache')

CKPT_DEFAULT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'flagship_toy.msgpack')

# alphanumerics render reliably with the cv2 HERSHEY fonts; all are in
# DICT90 so the flagship convertor needs no changes
_CHARS = ('0123456789'
          'abcdefghijklmnopqrstuvwxyz'
          'ABCDEFGHIJKLMNOPQRSTUVWXYZ')


def enable_compile_cache():
    import jax
    # this jax build ignores JAX_COMPILATION_CACHE_DIR (like JAX_PLATFORMS);
    # only the config API works (see bench.py)
    jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)


def render_dataset(n: int, seed: int = 0, h: int = 32, w: int = 128):
    """n synthetic word crops: (imgs float32 (n,h,w,3) in [-1,1], texts).

    cv2.putText over a light background with per-sample font/scale/slant
    jitter — enough visual variety that memorizing the set exercises the
    whole backbone+TPS+encoder+decoder stack, cheap enough to render 4k
    images in seconds on the 1-core host.
    """
    import cv2
    rng = np.random.default_rng(seed)
    fonts = [cv2.FONT_HERSHEY_SIMPLEX, cv2.FONT_HERSHEY_DUPLEX,
             cv2.FONT_HERSHEY_COMPLEX_SMALL, cv2.FONT_HERSHEY_TRIPLEX]
    imgs = np.empty((n, h, w, 3), np.float32)
    texts = []
    for i in range(n):
        k = int(rng.integers(3, 9))
        txt = ''.join(rng.choice(list(_CHARS), size=k))
        bg = int(rng.integers(180, 256))
        img = np.full((h, w, 3), bg, np.uint8)
        # mild background noise
        img = cv2.add(img, rng.integers(
            0, 20, (h, w, 3), dtype=np.uint8, endpoint=False))
        font = fonts[int(rng.integers(len(fonts)))]
        scale = float(rng.uniform(0.55, 0.85))
        color = tuple(int(v) for v in rng.integers(0, 90, 3))
        x0 = int(rng.integers(1, 6))
        y0 = int(rng.integers(20, 27))
        cv2.putText(img, txt, (x0, y0), font, scale, color,
                    1 + int(rng.integers(0, 2)), cv2.LINE_AA)
        imgs[i] = img.astype(np.float32) / 127.5 - 1.0
        texts.append(txt)
    return imgs, texts


def save_params(path: str, variables) -> None:
    from flax import serialization
    with open(path, 'wb') as f:
        f.write(serialization.to_bytes(variables))


def load_params(path: str, template):
    from flax import serialization
    with open(path, 'rb') as f:
        return serialization.from_bytes(template, f.read())


def timed_scan(fn, args, inner: int = 6, iters: int = 3, warmup: int = 2):
    """Wall-time `fn(*args)` batches inside one jitted scan (bench.py's
    measurement: block_until_ready is unreliable over the axon tunnel and
    ~30ms/dispatch tunnel latency must not be billed to the chip). `fn`
    must return an array; each inner batch depends on the previous scalar
    so nothing is elided. Returns seconds per single `fn` call."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_many(*a):
        def body(acc, _):
            perturbed = tuple(
                x + (acc * 1e-30).astype(x.dtype)
                if isinstance(x, jax.Array) and jnp.issubdtype(
                    x.dtype, jnp.floating) else x
                for x in a)
            s = fn(*perturbed).astype(jnp.float32).sum()
            return s, ()
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=inner)
        return acc

    def run():
        return float(np.asarray(run_many(*args)))

    for _ in range(warmup):
        assert np.isfinite(run())
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = time.perf_counter() - t0
    return dt / (iters * inner)
