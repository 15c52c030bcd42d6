"""Cost the whole-decode kernel's in-kernel all-rows-EOS early exit.

Evidence script for ROADMAP.md: `fused_early_exit=True` wraps the kernel's
40-step fori_loop in a while_loop with an all-rows-EOS stop. On real text
(~7 of 40 steps used) that should be a big serving win, but the while_loop
lowering has a per-iteration cost that must be measured before flipping
the default. Runs the TRAINED flagship (EOS actually fires) on rendered
text, plus random weights (EOS never fires — measures pure lowering
overhead on the fixed-40 protocol).

Usage:  python scratch/probe_early_exit.py [--ckpt scratch/flagship_toy.msgpack]
            [--batch 512]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from common import (CKPT_DEFAULT, enable_compile_cache, load_params,
                    render_dataset, timed_scan)


def bench_mode(rec, variables, img, vr, label, batch):
    sec = timed_scan(lambda v, i, r: rec._predict_impl(v, i, r),
                     (variables, img, vr))
    print(f'{label:38s} {sec * 1e3:7.2f} ms  {batch / sec:7.0f} img/s',
          flush=True)
    return sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', default=CKPT_DEFAULT)
    ap.add_argument('--batch', type=int, default=512)
    args = ap.parse_args()

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from tps_pp_tpu.apis.flagship import FLAGSHIP_INPUT, nrtr_tps_pp_cfg
    from tps_pp_tpu.apis.recognizer import build_recognizer

    h, w, c = FLAGSHIP_INPUT
    imgs, _ = render_dataset(args.batch, seed=0, h=h, w=w)
    real_img = jnp.asarray(imgs, jnp.bfloat16)
    rng = np.random.default_rng(0)
    rand_img = jnp.asarray(rng.standard_normal((args.batch, h, w, c)),
                           jnp.bfloat16)
    vr = jnp.ones((args.batch,), jnp.float32)

    for early in (False, True):
        cfg = nrtr_tps_pp_cfg(dtype='bfloat16', decode_mode='fused40_bf16')
        cfg['fused_early_exit'] = early
        rec = build_recognizer(cfg)
        variables = rec.init_variables(jax.random.PRNGKey(0), (2, h, w, c))
        tag = 'early_exit=on ' if early else 'early_exit=off'
        # random weights: EOS never fires -> full 40 steps, isolates the
        # while_loop lowering overhead (the bench.py regime)
        bench_mode(rec, jax.device_put(variables), rand_img, vr,
                   f'{tag} random-weights (40 steps)', args.batch)
        if os.path.exists(args.ckpt):
            trained = load_params(args.ckpt, variables)
            bench_mode(rec, jax.device_put(trained), real_img, vr,
                       f'{tag} trained on rendered text', args.batch)
        else:
            print(f'({args.ckpt} missing — run train_flagship_toy.py for '
                  'the real-text rows)', flush=True)


if __name__ == '__main__':
    main()
