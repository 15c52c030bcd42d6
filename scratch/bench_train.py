"""Flagship training-step throughput on the chip (B sweep x remat policy).

Evidence for ROADMAP's training-perf row: jitted sharded train step
(parallel/train.py), bf16 compute / f32 params+Adam. All `inner` steps
are chained inside ONE jitted lax.scan — block_until_ready is unreliable
over the axon tunnel and per-dispatch latency must not be billed to the
chip (same protocol as bench.py / scratch/common.timed_scan).
"""
import argparse, sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import enable_compile_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', nargs='+', type=int, default=[256, 512])
    ap.add_argument('--remats', nargs='+', default=['none', 'dots'])
    ap.add_argument('--inner', type=int, default=4)
    ap.add_argument('--iters', type=int, default=3)
    args = ap.parse_args()
    enable_compile_cache()
    import jax, jax.numpy as jnp, numpy as np
    from tps_pp_tpu.apis.flagship import FLAGSHIP_INPUT, nrtr_tps_pp_cfg
    from tps_pp_tpu.apis.recognizer import build_recognizer
    from tps_pp_tpu.parallel import TrainState, build_optimizer
    h, w, c = FLAGSHIP_INPUT
    rec = build_recognizer(nrtr_tps_pp_cfg(dtype='bfloat16'))
    rng = np.random.default_rng(0)
    for B in args.batches:
        td = rec.label_convertor.str2tensor(['ab3x' for _ in range(B)])
        batch = {
            'img': jnp.asarray(rng.standard_normal((B, h, w, c)),
                               jnp.bfloat16),
            'valid_ratio': jnp.ones((B,), jnp.float32),
            'padded_targets': jnp.asarray(td['padded_targets']),
        }
        for remat in args.remats:
            variables = rec.init_variables(jax.random.PRNGKey(0),
                                           (2, h, w, c))
            tx, _ = build_optimizer(dict(type='Adam', lr=1e-4,
                                         grad_clip=dict(max_norm=5.0)))
            state0 = TrainState.create(variables, tx)

            def loss_fn(params, bstats, rng_):
                v = {'params': params, 'batch_stats': bstats}
                total, (losses, new_state) = rec.compute_loss(
                    v, batch, rng_, train=True)
                return total, new_state.get('batch_stats', {})

            lf = loss_fn
            if remat == 'full':
                lf = jax.checkpoint(loss_fn)
            elif remat == 'dots':
                lf = jax.checkpoint(
                    loss_fn, policy=jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable)

            import optax

            @jax.jit
            def run_many(state):
                def body(st, i):
                    rng_ = jax.random.fold_in(jax.random.PRNGKey(1), i)
                    (loss, new_bs), grads = jax.value_and_grad(
                        lf, has_aux=True)(st.params, st.batch_stats, rng_)
                    updates, new_opt = st.tx.update(grads, st.opt_state,
                                                    st.params)
                    new_params = optax.apply_updates(st.params, updates)
                    return st.replace(step=st.step + 1, params=new_params,
                                      batch_stats=new_bs,
                                      opt_state=new_opt), loss
                st, losses = jax.lax.scan(body, state,
                                          jnp.arange(args.inner))
                return losses[-1]

            try:
                assert np.isfinite(float(run_many(state0)))   # compile+warm
                assert np.isfinite(float(run_many(state0)))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    float(run_many(state0))
                dt = (time.perf_counter() - t0) / (args.iters * args.inner)
                print(f'B={B:4d} remat={remat:5s} {dt*1e3:8.1f} ms/step '
                      f'{B/dt:7.0f} img/s', flush=True)
            except Exception as e:
                print(f'B={B:4d} remat={remat:5s} FAILED '
                      f'{type(e).__name__}: {str(e)[:120]}', flush=True)

if __name__ == '__main__':
    main()
