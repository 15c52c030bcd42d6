"""Is space-to-depth the stem answer? Time XLA convs at the original
stem geometry vs the s2d-transformed geometry (2x2 pixels folded into
channels: (N,32,128,32) -> (N,16,64,128), dense 3x3 kernel on the folded
grid = 4x the FLOPs at full 128-lane channel packing).

Decision input only — weight-transform correctness comes later if this
wins (scratch/probe_stem_taps.py showed the pallas matmul route is capped
far below XLA's conv at C=32, so better XLA packing is the remaining lever).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import enable_compile_cache, timed_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=512)
    args = ap.parse_args()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    N = args.batch
    rng = np.random.default_rng(0)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    cases = [
        # (name, H, W, Cin, Cout, kh, kw)  orig-FLOPs multiplier noted
        ('orig 32x128 c32', 32, 128, 32, 32, 3, 3),
        ('orig 16x64 c64', 16, 64, 64, 64, 3, 3),
        ('s2d  16x64 c128', 16, 64, 128, 128, 3, 3),   # 4x flops of c32
        ('s2d  8x32 c256', 8, 32, 256, 256, 3, 3),     # 4x flops of c64
        ('orig 1x1 c32', 32, 128, 32, 32, 1, 1),
        ('s2d  1x1 c128', 16, 64, 128, 128, 1, 1),     # same flops as c32 1x1
    ]
    for name, H, W, Ci, Co, kh, kw in cases:
        x = jnp.asarray(rng.standard_normal((N, H, W, Ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((kh, kw, Ci, Co)) * 0.1,
                        jnp.bfloat16)
        fn = jax.jit(conv)
        sec = timed_scan(lambda a, b, _f=fn: _f(a, b), (x, w))
        flops = 2 * kh * kw * Ci * Co * N * H * W
        print(f'{name:18s} {sec*1e3:7.3f} ms  {flops/sec/1e12:6.1f} TFLOP/s',
              flush=True)


if __name__ == '__main__':
    main()
