"""Pure-matmul orientation probe for the stem conv question: the
(C, P)-layout conv dot (Cout, 9C)@(9C, P) measured 8 TFLOP/s on-chip
(scratch/probe_stem_taps.py) — is the orientation the problem?

Shapes at flagship stem dims (C=32, P=512*32*128):
  cp    (32, 288) @ (288, P)    output rows = channels   [current kernel]
  pc    (P, 288) @ (288, 32)    output rows = pixels
  xla_* the same contractions via jnp.dot outside pallas
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import enable_compile_cache, timed_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--p', type=int, default=512 * 32 * 128)
    ap.add_argument('--k', type=int, default=288)
    ap.add_argument('--n', type=int, default=32)
    ap.add_argument('--bn', type=int, default=64)
    args = ap.parse_args()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, K, C = args.p, args.k, args.n
    rng = np.random.default_rng(0)
    a_cp = jnp.asarray(rng.standard_normal((K, P)) * 0.1, jnp.bfloat16)
    a_pc = jnp.asarray(rng.standard_normal((P, K)) * 0.1, jnp.bfloat16)
    w_cp = jnp.asarray(rng.standard_normal((C, K)) * 0.1, jnp.bfloat16)
    w_pc = jnp.asarray(rng.standard_normal((K, C)) * 0.1, jnp.bfloat16)
    pb = P // args.bn

    def kern_cp(a_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            w_ref[...], a_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    cp = pl.pallas_call(
        kern_cp,
        grid=(args.bn,),
        in_specs=[pl.BlockSpec((K, pb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, pb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, P), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def kern_pc(a_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    pc = pl.pallas_call(
        kern_pc,
        grid=(args.bn,),
        in_specs=[pl.BlockSpec((pb, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((pb, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def xla_cp(w, a):
        return jnp.dot(w, a, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    @jax.jit
    def xla_pc(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    flops = 2 * P * K * C
    for name, fn, arg in (
            ('cp pallas', cp, (a_cp, w_cp)),
            ('pc pallas', pc, (a_pc, w_pc)),
            ('cp xla', xla_cp, (w_cp, a_cp)),
            ('pc xla', xla_pc, (a_pc, w_pc)),
    ):
        sec = timed_scan(lambda *a, _f=fn: _f(*a), arg)
        print(f'{name:10s} {sec*1e3:7.3f} ms  {flops/sec/1e12:6.1f} TFLOP/s',
              flush=True)


if __name__ == '__main__':
    main()
