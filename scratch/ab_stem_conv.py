"""A/B one stem-geometry 3x3 conv: XLA NHWC vs the channels-on-sublanes
pallas formulation (ops/pallas_stem.py). Hypothesis from probe_stem.py:
XLA runs the 32-channel convs at ~25% MXU (lane packing); the (C,P)
matmul form with a 288-deep contraction should approach ~75%."""
import argparse, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import enable_compile_cache, timed_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--ch', type=int, default=32)
    ap.add_argument('--hw', type=int, nargs=2, default=[32, 128])
    ap.add_argument("--bn", type=int, default=64)
    args = ap.parse_args()
    enable_compile_cache()
    import jax, jax.numpy as jnp, numpy as np
    from tps_pp_tpu.ops.pallas_stem import (conv3x3_cp, nhwc_to_cp,
                                            cp_to_nhwc, hwio_to_taps)
    H, W = args.hw
    C = args.ch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    x2d = jax.jit(nhwc_to_cp)(x)
    wt = hwio_to_taps(w)
    bt = b[:, None]

    def xla(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b

    def cp(x2d):
        return conv3x3_cp(x2d, wt, bt, H=H, W=W, bn=args.bn)

    def cp_with_transposes(x):
        return cp_to_nhwc(conv3x3_cp(nhwc_to_cp(x), wt, bt, H=H, W=W,
                                     bn=args.bn), (args.batch, H, W))

    # correctness on-chip first (bf16 tolerance)
    ref = np.asarray(jax.jit(xla)(x), np.float32)
    got = np.asarray(jax.jit(cp_with_transposes)(x), np.float32)
    err = np.abs(ref - got).max()
    print(f'on-chip max abs err: {err:.4f} (bf16)', flush=True)

    flops = 2 * 9 * C * C * args.batch * H * W
    for name, fn, arg in (('xla conv', xla, x), ('cp kernel', cp, x2d),
                          ('cp + transposes', cp_with_transposes, x)):
        sec = timed_scan(lambda a, _f=fn: _f(a), (arg,))
        print(f'{name:16s} {sec*1e3:7.3f} ms  '
              f'{flops/sec/1e12:6.1f} TFLOP/s', flush=True)

if __name__ == '__main__':
    main()
