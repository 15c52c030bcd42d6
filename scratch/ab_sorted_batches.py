"""A/B: length-sorted vs shuffled batch order through the fused decode
with early exit (trained flagship, rendered text). Same compiled program
— only the data order differs — so this isolates the early-exit win from
grouping similar-length texts per batch block."""
import argparse, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import (CKPT_DEFAULT, enable_compile_cache, load_params,
                    render_dataset, timed_scan)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', default=CKPT_DEFAULT)
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--length-dist', choices=['uniform', 'real'],
                    default='uniform')
    ap.add_argument('--max-len', type=int, default=8)
    args = ap.parse_args()
    enable_compile_cache()
    import jax, jax.numpy as jnp, numpy as np
    from tps_pp_tpu.apis.flagship import FLAGSHIP_INPUT, nrtr_tps_pp_cfg
    from tps_pp_tpu.apis.recognizer import build_recognizer
    h, w, c = FLAGSHIP_INPUT
    imgs, texts = render_dataset(args.batch, seed=0, h=h, w=w,
                                 max_len=args.max_len,
                                 length_dist=args.length_dist)
    rec = build_recognizer(nrtr_tps_pp_cfg(dtype='bfloat16',
                                           decode_mode='auto'))
    variables = rec.init_variables(jax.random.PRNGKey(0), (2, h, w, c))
    variables = jax.device_put(load_params(args.ckpt, variables))
    vr = jnp.ones((args.batch,), jnp.float32)
    shuffled = np.random.default_rng(1).permutation(args.batch)
    by_len = np.argsort([len(t) for t in texts], kind='stable')
    for name, order in (('shuffled', shuffled), ('length-sorted', by_len)):
        img = jnp.asarray(imgs[order], jnp.bfloat16)
        sec = timed_scan(lambda v, i, r: rec._predict_impl(v, i, r),
                         (variables, img, vr))
        print(f'{name:14s} {sec*1e3:7.2f} ms  '
              f'{args.batch/sec:7.0f} img/s', flush=True)

if __name__ == '__main__':
    main()
