"""Sweep the whole-decode kernel's batch-block (TPS_FUSED_BT) on the chip.

The decode stage measures 17.4 ms against a ~1.5 ms FLOPs floor: at bt=64
the kernel issues ~11k tiny (64,512)-row matmuls across 40 steps x 6
layers x 8 blocks, so per-matmul issue latency dominates. Bigger blocks
cut the block count linearly until VMEM runs out."""
import argparse, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import enable_compile_cache, timed_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--bts', nargs='+', type=int, default=[64, 128, 256])
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
    for bt in args.bts:
        os.environ['TPS_FUSED_BT'] = str(bt)
        rec = build_recognizer(nrtr_tps_pp_cfg(dtype='bfloat16',
                                               decode_mode='auto'))
        variables = jax.device_put(
            rec.init_variables(jax.random.PRNGKey(0), (2, h, w, c)))
        try:
            sec = timed_scan(lambda v, i, r: rec._predict_impl(v, i, r),
                             (variables, img, vr))
            print(f'bt={bt:4d}  {sec*1e3:7.2f} ms  '
                  f'{args.batch/sec:7.0f} img/s', flush=True)
        except Exception as e:
            print(f'bt={bt:4d}  FAILED {type(e).__name__}: '
                  f'{str(e)[:160]}', flush=True)

if __name__ == '__main__':
    main()
