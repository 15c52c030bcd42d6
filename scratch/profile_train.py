"""Training-step cost breakdown on the chip: where do the ~640 ms/step
(B=512, bf16, no remat — ROADMAP training ledger) actually go?

Variants (each timed like bench_train: `inner` steps chained inside ONE
jitted lax.scan; per-dispatch axon-tunnel latency not billed to the chip):

  full      value_and_grad + adam update            (the ledger number)
  fwd       loss forward only (train=True)          -> bwd+update = full-fwd
  notps     full, cfg without tpsnet                -> rectifier total
  nosample  full, grid_sample -> strided slice      -> sampler (+DCE'd
            (differentiable, ~free)                    MSFA/TPE: grid unused)
  sg_grid   full, stop_gradient(grid) at the sampler -> grid-path backward
                                                       (MSFA/TPE/grid-gen bwd)

Stop-gradient-point ledger (full - sg_X = backward cost of everything
UPSTREAM of point X, i.e. what the cotangent no longer has to traverse):

  sg_stem   sg after backbone.stem_and_head   -> stem backward
  sg_rect   sg on tpsnet 'output'             -> stem+TPS backward
  sg_feat   sg on extract_feat output         -> whole-backbone+TPS backward
  sg_enc    sg on (feat, out_enc) pre-decoder -> all-but-decoder backward
  no_opt    grads but no clip/adam/update     -> optimizer cost = full-no_opt

The gather sampler's backward is a scatter-add into (N,32,128,64) /
(N,16,64,64) features — the suspected TPU-hostile op (training uses the
differentiable gather path; the fused Pallas sampler is serving-only,
models/rectifiers/tps_pp.py:312-316).

Usage: python scratch/profile_train.py [--batch 512] [--inner 4] [--iters 3]
       [--variants full fwd notps nosample sg_grid]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import enable_compile_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--inner', type=int, default=4)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--variants', nargs='+',
                    default=['full', 'fwd', 'notps', 'nosample', 'sg_grid',
                             'sg_stem', 'sg_rect', 'sg_feat', 'sg_enc',
                             'no_opt', 'nodrop', 'declayers3',
                             'enclayers3', 'rbg'])
    args = ap.parse_args()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tps_pp_tpu.apis.flagship import FLAGSHIP_INPUT, nrtr_tps_pp_cfg
    from tps_pp_tpu.apis.recognizer import build_recognizer
    from tps_pp_tpu.models.rectifiers import tps_pp as tps_pp_mod
    from tps_pp_tpu.ops.grid_sample import grid_sample as real_grid_sample
    from tps_pp_tpu.parallel import TrainState, build_optimizer

    h, w, c = FLAGSHIP_INPUT
    B = args.batch
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, h, w, c)), jnp.bfloat16)

    def sliced_sample(im, grid, **kw):
        # differentiable, ~free stand-in: stride the input down to the
        # grid's output shape (keeps shapes/dtypes; drops the grid path,
        # so MSFA/TPE fwd+bwd get DCE'd along with the sampler)
        N, H, W, C = im.shape
        Ho, Wo = grid.shape[1], grid.shape[2]
        return im[:, ::H // Ho, ::W // Wo]

    def sg_grid_sample(im, grid, **kw):
        return real_grid_sample(im, jax.lax.stop_gradient(grid), **kw)

    from tps_pp_tpu.models.recognizers.encode_decode import (
        EncodeDecodeRecognizerModule as EDR)
    orig_extract = EDR.extract_feat
    orig_encode_full = EDR.encode_full

    def make_extract(sg_point):
        # mirrors EDR.extract_feat (flagship path: no preprocessor,
        # tpsnet present) with a stop_gradient spliced at sg_point
        def extract_feat(self, img, train=False, stem=None):
            x, skips = (stem if stem is not None else
                        self.backbone.stem_and_head(img, train=train))
            if sg_point == 'stem':
                x = jax.lax.stop_gradient(x)
                skips = [jax.lax.stop_gradient(s) for s in skips]
            outs = self.tpsnet(x, skips, train=train)
            o = outs['output']
            if sg_point == 'rect':
                o = jax.lax.stop_gradient(o)
            x = self.backbone.tail(o, train=train)
            if sg_point == 'feat':
                x = jax.lax.stop_gradient(x)
            return x
        return extract_feat

    def sg_encode_full(self, img, valid_ratio=None, train=False, stem=None):
        feat, out_enc = orig_encode_full(self, img, valid_ratio,
                                         train=train, stem=stem)
        feat = jax.lax.stop_gradient(feat)
        if out_enc is not None:
            out_enc = jax.lax.stop_gradient(out_enc)
        return feat, out_enc

    def zero_dropout(d):
        if isinstance(d, dict):
            return {k: (0.0 if 'drop' in k and isinstance(v, (int, float))
                        and not isinstance(v, bool) else zero_dropout(v))
                    for k, v in d.items()}
        if isinstance(d, list):
            return [zero_dropout(v) for v in d]
        return d

    results = {}
    for variant in args.variants:
        cfg = nrtr_tps_pp_cfg(dtype='bfloat16')
        if variant == 'nodrop':
            cfg = zero_dropout(cfg)
        elif variant == 'declayers3':
            cfg['decoder'] = dict(cfg['decoder'], n_layers=3)
        elif variant == 'enclayers3':
            cfg['encoder'] = dict(cfg['encoder'], n_layers=3)
        if variant == 'notps':
            cfg.pop('tpsnet')
        tps_pp_mod.grid_sample = {
            'nosample': sliced_sample, 'sg_grid': sg_grid_sample,
        }.get(variant, real_grid_sample)
        EDR.extract_feat = (make_extract(variant[3:])
                            if variant in ('sg_stem', 'sg_rect', 'sg_feat')
                            else orig_extract)
        EDR.encode_full = (sg_encode_full if variant == 'sg_enc'
                           else orig_encode_full)

        base_key = (jax.random.key(1, impl='rbg') if variant == 'rbg'
                    else jax.random.PRNGKey(1))
        rec = build_recognizer(cfg)
        td = rec.label_convertor.str2tensor(['ab3x'] * B)
        batch = {'img': img,
                 'valid_ratio': jnp.ones((B,), jnp.float32),
                 'padded_targets': jnp.asarray(td['padded_targets'])}
        variables = rec.init_variables(jax.random.PRNGKey(0), (2, h, w, c))
        tx, _ = build_optimizer(dict(type='Adam', lr=1e-4,
                                     grad_clip=dict(max_norm=5.0)))
        state0 = TrainState.create(variables, tx)

        def loss_fn(params, bstats, rng_):
            v = {'params': params}
            if bstats:
                v['batch_stats'] = bstats
            total, (losses, new_state) = rec.compute_loss(
                v, batch, rng_, train=True)
            return total, new_state.get('batch_stats', {})

        if variant == 'fwd':
            @jax.jit
            def run_many(state):
                def body(acc, i):
                    rng_ = jax.random.fold_in(base_key, i)
                    loss, _ = loss_fn(state.params, state.batch_stats, rng_)
                    return acc + loss, ()
                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                      jnp.arange(args.inner))
                return acc
        elif variant == 'no_opt':
            @jax.jit
            def run_many(state):
                def body(acc, i):
                    rng_ = jax.random.fold_in(base_key, i)
                    (loss, _), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(state.params,
                                               state.batch_stats, rng_)
                    # reduce grads into the output so the backward can't
                    # be DCE'd; one scalar-add per leaf, ~free
                    gsum = sum(jnp.sum(g.astype(jnp.float32))
                               for g in jax.tree_util.tree_leaves(grads))
                    return acc + loss + 1e-9 * gsum, ()
                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                      jnp.arange(args.inner))
                return acc
        else:
            @jax.jit
            def run_many(state):
                def body(st, i):
                    rng_ = jax.random.fold_in(base_key, i)
                    (loss, new_bs), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(st.params, st.batch_stats,
                                               rng_)
                    updates, new_opt = st.tx.update(grads, st.opt_state,
                                                    st.params)
                    new_params = optax.apply_updates(st.params, updates)
                    return st.replace(step=st.step + 1, params=new_params,
                                      batch_stats=new_bs,
                                      opt_state=new_opt), loss
                st, losses = jax.lax.scan(body, state,
                                          jnp.arange(args.inner))
                return losses[-1]

        assert np.isfinite(float(run_many(state0)))
        assert np.isfinite(float(run_many(state0)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(run_many(state0))
        dt = (time.perf_counter() - t0) / (args.iters * args.inner)
        results[variant] = dt
        print(f'{variant:9s} {dt * 1e3:8.1f} ms/step  {B / dt:7.0f} img/s',
              flush=True)

    tps_pp_mod.grid_sample = real_grid_sample
    EDR.extract_feat = orig_extract
    EDR.encode_full = orig_encode_full
    if 'full' in results:
        f = results['full']
        for k, v in results.items():
            if k != 'full':
                print(f'full - {k:9s} = {(f - v) * 1e3:7.1f} ms')


if __name__ == '__main__':
    main()
