"""Per-stage timing of the flagship inference path (incremental prefixes).

Evidence script for ROADMAP.md's perf ledger. Each stage is timed as the
DIFFERENCE of two jitted prefix programs (stem; stem+TPS-estimate;
stem+TPS; +tail; +encoder; full decode): over the axon tunnel a profiler
trace is impractical and per-dispatch latency swamps small ops, so each
prefix runs `inner` batches inside one jitted scan (common.timed_scan) and
a stage cost is prefix[k] - prefix[k-1]. Compile noise is excluded by
warmup; differences are stable to ~0.3 ms at B=512.

Usage:  python scratch/profile_stages.py [--batch 512]
"""
from __future__ import annotations

import argparse

from common import enable_compile_cache, timed_scan


def measure_stages(batch: int = 512, inner: int = 6, iters: int = 3,
                   quiet: bool = False):
    """Measure the per-stage serving ledger; returns
    {'decode_mode', 'prefix_ms': {name: ms}, 'stage_ms': {name: ms}}.
    Also importable by bench.py (BENCH_STAGES=1) so the driver-captured
    JSON can carry the ledger."""
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tps_pp_tpu.apis.flagship import FLAGSHIP_INPUT, nrtr_tps_pp_cfg
    from tps_pp_tpu.apis.recognizer import build_recognizer

    h, w, c = FLAGSHIP_INPUT
    rec = build_recognizer(nrtr_tps_pp_cfg(dtype='bfloat16', decode_mode='auto'))
    variables = rec.init_variables(jax.random.PRNGKey(0), (2, h, w, c))
    variables = jax.device_put(variables)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, h, w, c)),
                      jnp.bfloat16)
    vr = jnp.ones((batch,), jnp.float32)
    mod = rec.module

    # prefix programs — each returns a single array so timed_scan can chain
    def p_stem(v, i, r):
        x, _ = mod.apply(v, i, train=False, method=lambda m, im, train:
                         m.backbone.stem_and_head(im, train=train))
        return x

    def p_tps_estimate(v, i, r):
        # TPS++ up to the control-point estimate (MSFA+TPE), no sampling —
        # replicates TPS_PP.__call__'s prefix against the bound submodules
        def f(m, im, train):
            from tps_pp_tpu.models.layers import upsample_nearest
            x, skips = m.backbone.stem_and_head(im, train=train)
            t = m.tpsnet
            feat0 = t.down0(skips[0])
            feat1 = t.down1(skips[1])
            feat2 = t.down2(x)
            feat_cat = jnp.concatenate(
                [t.down0_1(feat0), t.down1_1(feat1), feat2], axis=-1)
            t.down_feat(jnp.concatenate(
                [feat0, feat1, upsample_nearest(feat2, 2)], axis=-1))
            logits = t.MSFA(feat_cat)
            cp, score = t.TPE(logits['en_feat'], logits['de_feat'])
            return cp + score.mean()
        return mod.apply(v, i, train=False, method=f)

    def p_tps(v, i, r):
        def f(m, im, train):
            x, skips = m.backbone.stem_and_head(im, train=train)
            return m.tpsnet(x, skips, train=train)['output']
        return mod.apply(v, i, train=False, method=f)

    def p_tail(v, i, r):
        return mod.apply(v, i, train=False,
                         method=lambda m, im, train:
                         m.extract_feat(im, train=train))

    def p_encoder(v, i, r):
        def f(m, im, vr_, train):
            feat = m.extract_feat(im, train=train)
            return m.encoder(feat, valid_ratio=vr_, train=train, fused=True)
        return mod.apply(v, i, vr, train=False, method=f)

    def p_full(v, i, r):
        return rec._predict_impl(v, i, r)

    stages = [('backbone stem', p_stem),
              ('+ TPS estimate', p_tps_estimate),
              ('+ TPS sample', p_tps), ('+ backbone tail', p_tail),
              ('+ encoder (fused)', p_encoder), ('full (decode)', p_full)]

    prev = 0.0
    out = {'decode_mode': rec.resolved_decode_mode(), 'prefix_ms': {},
           'stage_ms': {}}
    if not quiet:
        print(f'B={batch} bf16; decode={out["decode_mode"]}')
    for name, fn in stages:
        sec = timed_scan(lambda v, i, r, _f=fn: _f(v, i, r),
                         (variables, img, vr),
                         inner=inner, iters=iters)
        ms = sec * 1e3
        ips = batch / sec
        out['prefix_ms'][name] = round(ms, 2)
        out['stage_ms'][name] = round(ms - prev, 2)
        if not quiet:
            print(f'{name:20s} prefix {ms:7.2f} ms  stage {ms - prev:7.2f} ms '
                  f' ({ips:7.0f} img/s cumulative)', flush=True)
        prev = ms
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--inner', type=int, default=6)
    ap.add_argument('--iters', type=int, default=3)
    args = ap.parse_args()
    measure_stages(args.batch, args.inner, args.iters)


if __name__ == '__main__':
    main()
