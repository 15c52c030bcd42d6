"""On-chip cost split of the TRAINING-path TPS sampler at flagship shapes
(B=512: feat_grid (B,32,128,64) bf16, grid (B,16,64,2) f32).

profile_train.py attributes ~96 ms of the 316 ms train step to the sampler
block (full - nosample) and ~48 ms to the grid path (full - sg_grid); this
script splits the sampler's own cost into

  fwd      gather+lerp forward (4 gathers)
  d_img    Pallas transpose-interpolation matmul (ops/pallas_grid_sample)
  d_grid   autodiff of the gather formulation w.r.t. the grid
  vjp_all  one pullback producing both cotangents (the real training path)

Usage: python scratch/bench_sampler_pieces.py [--batch 512]
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

    from tps_pp_tpu.ops.grid_sample import _gather_impl
    from tps_pp_tpu.ops.pallas_grid_sample import grid_sample_grad_img

    B = args.batch
    H, W, C = 32, 128, 64
    Ho, Wo = 16, 64
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    grid = jnp.asarray(rng.uniform(-1.05, 1.05, (B, Ho, Wo, 2)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((B, Ho, Wo, C)), jnp.bfloat16)

    def fwd(im, gr, _):
        return _gather_impl(im, gr, 'border', True)

    def d_img(im, gr, ct):
        return grid_sample_grad_img(gr, ct, H, W, 'border', True)

    def d_grid(im, gr, ct):
        _, pull = jax.vjp(lambda g: _gather_impl(im, g, 'border', True), gr)
        return pull(ct)[0]

    def vjp_all(im, gr, ct):
        _, pull = jax.vjp(
            lambda i, g: _gather_impl(i, g, 'border', True), im, gr)
        di, dg = pull(ct)
        return (di.astype(jnp.float32).sum((-1, -2, -3))
                + dg.sum((-1, -2, -3)))

    for name, fn in [('fwd', fwd), ('d_img', d_img), ('d_grid', d_grid),
                     ('vjp_all(xla)', vjp_all)]:
        dt = timed_scan(fn, (img, grid, cot))
        print(f'{name:12s} {dt * 1e3:8.2f} ms', flush=True)


if __name__ == '__main__':
    main()
