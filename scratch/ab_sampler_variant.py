"""A/B the TPS sampler kernel variants on the chip (dense vs twostage).

Evidence script for ROADMAP.md "Two-stage TPS sampler variant": times the
TPS++ prefix (stem + estimate + SAMPLE) and the full flagship pipeline
under both `TPS_SAMPLER_VARIANT` values. The variant knob is resolved
outside the jitted core (ops/pallas_tps.py), so each run rebuilds the
recognizer after setting the env var.

Usage:  python scratch/ab_sampler_variant.py [--batch 512]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from common import enable_compile_cache, timed_scan


def measure(variant, batch):
    os.environ['TPS_SAMPLER_VARIANT'] = variant
    import jax
    import jax.numpy as jnp
    from tps_pp_tpu.apis.flagship import FLAGSHIP_INPUT, nrtr_tps_pp_cfg
    from tps_pp_tpu.apis.recognizer import build_recognizer

    h, w, c = FLAGSHIP_INPUT
    rec = build_recognizer(nrtr_tps_pp_cfg(dtype='bfloat16'))
    variables = jax.device_put(
        rec.init_variables(jax.random.PRNGKey(0), (2, h, w, c)))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, h, w, c)), jnp.bfloat16)
    vr = jnp.ones((batch,), jnp.float32)
    mod = rec.module

    def p_tps(v, i, r):
        def f(m, im, train):
            x, skips = m.backbone.stem_and_head(im, train=train)
            return m.tpsnet(x, skips, train=train)['output']
        return mod.apply(v, i, train=False, method=f)

    def p_full(v, i, r):
        return rec._predict_impl(v, i, r)

    for name, fn in (('stem+TPS', p_tps), ('full pipeline', p_full)):
        sec = timed_scan(lambda v, i, r, _f=fn: _f(v, i, r),
                         (variables, img, vr))
        print(f'{variant:9s} {name:14s} {sec * 1e3:7.2f} ms '
              f' {batch / sec:7.0f} img/s', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--variants', nargs='+', default=['dense', 'twostage'])
    args = ap.parse_args()
    enable_compile_cache()
    for v in args.variants:
        measure(v, args.batch)


if __name__ == '__main__':
    main()
