"""Serving latency sweep: flagship predict across batch sizes (the
production small-batch story; bench.py is the B=512 throughput headline).
Uses the same in-jit chaining as bench.py so tunnel latency isn't billed.
"""
import argparse, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import enable_compile_cache, timed_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', nargs='+', type=int,
                    default=[1, 8, 32, 128, 512])
    args = ap.parse_args()
    enable_compile_cache()
    import jax, jax.numpy as jnp, numpy as np
    from tps_pp_tpu.apis.flagship import FLAGSHIP_INPUT, nrtr_tps_pp_cfg
    from tps_pp_tpu.apis.recognizer import build_recognizer
    h, w, c = FLAGSHIP_INPUT
    rec = build_recognizer(nrtr_tps_pp_cfg(dtype='bfloat16',
                                           decode_mode='auto'))
    variables = jax.device_put(
        rec.init_variables(jax.random.PRNGKey(0), (2, h, w, c)))
    rng = np.random.default_rng(0)
    for B in args.batches:
        img = jnp.asarray(rng.standard_normal((B, h, w, c)), jnp.bfloat16)
        vr = jnp.ones((B,), jnp.float32)
        sec = timed_scan(lambda v, i, r: rec._predict_impl(v, i, r),
                         (variables, img, vr))
        print(f'B={B:4d}  {sec*1e3:7.2f} ms/batch  '
              f'{B/sec:7.0f} img/s', flush=True)

if __name__ == '__main__':
    main()
