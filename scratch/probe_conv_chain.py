"""Per-conv cost by CHAIN DELTA: time k-deep conv chains (output feeds
input) at k=2 and k=18 and report (t18-t2)/16 — cancels the timed_scan
fixed overhead (~4 ms at these sizes: the perturbation copy + output
reduction swamp a single 0.1-1 ms conv, which made every standalone conv
in probe_s2d_conv.py read ~4.5 ms regardless of FLOPs).

Decides the stem question: XLA per-conv cost at the original 32/64-channel
geometry vs the space-to-depth-folded 128/256-channel geometry (4x FLOPs,
full lane packing).
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import enable_compile_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--inner', type=int, default=4)
    args = ap.parse_args()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    N = args.batch
    rng = np.random.default_rng(0)

    def chain(x, w, k):
        for _ in range(k):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            # keep magnitudes sane through 18 layers
            x = x * jnp.bfloat16(0.1)
        return x

    def timed(fn, x, w):
        @jax.jit
        def run_many(x, w):
            def body(acc, _):
                out = fn(x + (acc * 1e-30).astype(x.dtype), w)
                return out.astype(jnp.float32).sum(), ()
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                  length=args.inner)
            return acc
        for _ in range(2):
            assert np.isfinite(float(np.asarray(run_many(x, w))))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(np.asarray(run_many(x, w)))
        return (time.perf_counter() - t0) / (args.iters * args.inner)

    cases = [
        ('orig 32x128 c32 3x3', 32, 128, 32, 3),
        ('orig 16x64 c64 3x3', 16, 64, 64, 3),
        ('s2d  16x64 c128 3x3', 16, 64, 128, 3),
        ('s2d  8x32 c256 3x3', 8, 32, 256, 3),
        ('orig 32x128 c32 1x1', 32, 128, 32, 1),
        ('s2d  16x64 c128 1x1', 16, 64, 128, 1),
    ]
    for name, H, W, C, kk in cases:
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((kk, kk, C, C)) * 0.3,
                        jnp.bfloat16)
        t2 = timed(functools.partial(chain, k=2), x, w)
        t18 = timed(functools.partial(chain, k=18), x, w)
        per = (t18 - t2) / 16
        flops = 2 * kk * kk * C * C * N * H * W
        print(f'{name:22s} {per*1e3:7.3f} ms/conv  '
              f'{flops/per/1e12:6.1f} TFLOP/s', flush=True)


if __name__ == '__main__':
    main()
