"""Device-forward throughput for the non-flagship families (detection +
ABINet + CRNN/SAR): the jitted network forward at serving shapes (host
postprocessing excluded — it runs overlapped on CPU). Same in-jit
chaining protocol as bench.py."""
import argparse, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import enable_compile_cache, timed_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--det-size', type=int, nargs=2, default=[640, 640])
    ap.add_argument('--det-batch', type=int, default=8)
    ap.add_argument('--recog-batch', type=int, default=512)
    args = ap.parse_args()
    enable_compile_cache()
    import jax, jax.numpy as jnp, numpy as np
    from tps_pp_tpu.config import load_config
    rng = np.random.default_rng(0)

    # --- detection forwards (DBNet r18, PANet r18) ---
    from tps_pp_tpu.apis.train_det import build_detector_module
    H, W = args.det_size
    B = args.det_batch
    for name, cfg_path in (
            ('dbnet_r18', 'configs/textdet/dbnet/'
             'dbnet_r18_fpnc_1200e_icdar2015.py'),
            ('panet_r18', 'configs/textdet/panet/'
             'panet_r18_fpem_ffm_600e_icdar2015.py')):
        try:
            cfg = load_config(cfg_path)
            mod = build_detector_module(cfg['model'])
            v = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, H, W, 3), jnp.float32), train=False)
            img = jnp.asarray(rng.standard_normal((B, H, W, 3)),
                              jnp.bfloat16).astype(jnp.float32)
            sec = timed_scan(lambda vv, i: mod.apply(vv, i, train=False),
                             (v, img))
            print(f'{name:12s} B={B} {H}x{W}  {sec*1e3:7.2f} ms/batch '
                  f'{B/sec:7.1f} img/s', flush=True)
        except Exception as e:
            print(f'{name:12s} FAILED {type(e).__name__}: {str(e)[:120]}',
                  flush=True)

    # --- recognition families (jitted predict core) ---
    from tps_pp_tpu.apis.recognizer import build_recognizer
    from tps_pp_tpu.apis.abinet import ABINetRecognizer
    Br = args.recog_batch
    for name, cfg_path, hw, ch in (
            ('abinet', 'configs/_base_/recog_models/abinet.py', (32, 128), 3),
            ('crnn', 'configs/textrecog/crnn/crnn_academic_dataset.py',
             (32, 100), 1),
            ('sar_parallel',
             'configs/textrecog/sar/sar_r31_parallel_decoder_academic.py',
             (48, 160), 3)):
        try:
            cfg = load_config(cfg_path)
            mcfg = dict(cfg['model'])
            mcfg['dtype'] = 'bfloat16'
            rec = build_recognizer(mcfg)
            h, w = hw
            variables = jax.device_put(
                rec.init_variables(jax.random.PRNGKey(0), (2, h, w, ch)))
            img = jnp.asarray(rng.standard_normal((Br, h, w, ch)),
                              jnp.bfloat16)
            vr = jnp.ones((Br,), jnp.float32)
            sec = timed_scan(lambda vv, i, r: rec._predict_impl(vv, i, r),
                             (variables, img, vr))
            print(f'{name:12s} B={Br} {h}x{w}  {sec*1e3:7.2f} ms/batch '
                  f'{Br/sec:7.0f} img/s  mode={rec.resolved_decode_mode()}',
                  flush=True)
        except Exception as e:
            print(f'{name:12s} FAILED {type(e).__name__}: {str(e)[:120]}',
                  flush=True)

if __name__ == '__main__':
    main()
