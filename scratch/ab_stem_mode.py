"""Full-pipeline A/B: flagship predict with stem_mode 'xla' vs 'fused'
(ops/pallas_stem.py channels-on-sublanes kernels). Also asserts argmax
agreement between the two stems on random weights before timing."""
import argparse, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import enable_compile_cache, timed_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--modes', nargs='+', default=['xla', 'fused'])
    args = ap.parse_args()
    enable_compile_cache()
    import jax, jax.numpy as jnp, numpy as np
    from tps_pp_tpu.apis.flagship import FLAGSHIP_INPUT, nrtr_tps_pp_cfg
    from tps_pp_tpu.apis.recognizer import build_recognizer
    h, w, c = FLAGSHIP_INPUT
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((args.batch, h, w, c)),
                      jnp.bfloat16)
    vr = jnp.ones((args.batch,), jnp.float32)
    variables = None
    argmax = {}
    for mode in args.modes:
        cfg = nrtr_tps_pp_cfg(dtype='bfloat16', decode_mode='auto')
        cfg['stem_mode'] = mode
        rec = build_recognizer(cfg)
        if variables is None:
            variables = jax.device_put(
                rec.init_variables(jax.random.PRNGKey(0), (2, h, w, c)))
        assert rec.resolved_stem_mode() == mode, rec.resolved_stem_mode()
        scores = np.asarray(rec._predict_jit_fn(variables, img, vr)
                            if hasattr(rec, '_predict_jit_fn') else
                            jax.jit(rec._predict_impl)(variables, img, vr),
                            np.float32)
        argmax[mode] = scores.argmax(-1)
        sec = timed_scan(lambda v, i, r, _r=rec: _r._predict_impl(v, i, r),
                         (variables, img, vr))
        print(f'stem={mode:5s}  {sec*1e3:7.2f} ms  '
              f'{args.batch/sec:7.0f} img/s', flush=True)
    base = args.modes[0]
    for mode in args.modes[1:]:
        flips = int((argmax[base] != argmax[mode]).sum())
        print(f'argmax flips {base} vs {mode}: '
              f'{flips}/{argmax[base].size}', flush=True)

if __name__ == '__main__':
    main()
