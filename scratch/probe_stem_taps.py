"""Decompose the (C, P) stem conv kernel's cost on-chip: which piece of
tap construction (lane rolls / boundary masks / the 9-way concat) explains
the 5.1 ms vs the pure matmul?

Variants (all same dot; numerics intentionally WRONG for probe variants):
  full      rolls + masks + concat + dot      (= conv3x3_cp)
  noroll    masks + concat + dot (taps unshifted)
  nomask    rolls + concat + dot
  dotonly   pre-materialized (9C, P) patches input (HBM 9x traffic,
            auto-pipelined) + dot — the matmul+DMA floor
  dot0      zeros patches built in-kernel (broadcast, ~free) + dot —
            the matmul-only floor
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import enable_compile_cache, timed_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--ch', type=int, default=32)
    ap.add_argument('--hw', type=int, nargs=2, default=[32, 128])
    ap.add_argument('--bn', type=int, default=64)
    args = ap.parse_args()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tps_pp_tpu.ops.pallas_stem import _shift_tap, nhwc_to_cp

    H, W = args.hw
    C = args.ch
    N = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
    x2d = jax.jit(nhwc_to_cp)(x)
    w = jnp.asarray(rng.standard_normal((C, 9 * C)) * 0.1, jnp.bfloat16)
    P = N * H * W
    pb = P // args.bn

    def tap_mask(dy, dx):
        pix = jax.lax.broadcasted_iota(jnp.int32, (1, pb), 1)
        ok = jnp.ones((1, pb), jnp.bool_)
        ww = pix % W
        hh = (pix // W) % H
        if dx > 0:
            ok &= ww < W - dx
        elif dx < 0:
            ok &= ww >= -dx
        if dy > 0:
            ok &= hh < H - dy
        elif dy < 0:
            ok &= hh >= -dy
        return ok

    def kern(x_ref, w_ref, o_ref, *, roll, mask):
        xv = x_ref[...]
        taps = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = dy * W + dx
                t = xv
                if roll and s != 0:
                    t = jnp.roll(xv, -s, axis=1)
                if mask:
                    t = jnp.where(tap_mask(dy, dx), t, jnp.zeros_like(t))
                if not roll and not mask:
                    # keep each tap distinct so nothing is CSE'd
                    t = t + jnp.bfloat16(dy * 3 + dx)
                taps.append(t)
        patches = jnp.concatenate(taps, axis=0)
        o_ref[...] = jax.lax.dot_general(
            w_ref[...], patches, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    def build(roll, mask):
        return pl.pallas_call(
            functools.partial(kern, roll=roll, mask=mask),
            grid=(args.bn,),
            in_specs=[
                pl.BlockSpec((C, pb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 9 * C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((C, pb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, P), x2d.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    # dotonly: patches as a (9C, P) HBM input, auto-pipelined blocks
    patches_full = jnp.tile(x2d, (9, 1))

    def dot_kern(p_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            w_ref[...], p_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    dotonly = pl.pallas_call(
        dot_kern,
        grid=(args.bn,),
        in_specs=[
            pl.BlockSpec((9 * C, pb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 9 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, pb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, P), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    flops = 2 * 9 * C * C * P
    for name, fn, arg in (
            ('full', build(True, True), (x2d, w)),
            ('noroll', build(False, True), (x2d, w)),
            ('nomask', build(True, False), (x2d, w)),
            ('base', build(False, False), (x2d, w)),
            ('dotonly', dotonly, (patches_full, w)),
    ):
        sec = timed_scan(lambda *a, _f=fn: _f(*a), arg)
        print(f'{name:8s} {sec*1e3:7.3f} ms  {flops/sec/1e12:6.1f} TFLOP/s',
              flush=True)


if __name__ == '__main__':
    main()
