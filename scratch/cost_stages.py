"""FLOPs/bytes per serving stage via XLA cost_analysis (evidence for the
conv-block optimization work: how far stem/TPS-estimate/tail are from the
v5e roofline at B=512 bf16)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import enable_compile_cache  # noqa: E402

def main():
    enable_compile_cache()
    import jax, jax.numpy as jnp, numpy as np
    from tps_pp_tpu.apis.flagship import FLAGSHIP_INPUT, nrtr_tps_pp_cfg
    from tps_pp_tpu.apis.recognizer import build_recognizer
    h, w, c = FLAGSHIP_INPUT
    B = 512
    rec = build_recognizer(nrtr_tps_pp_cfg(dtype='bfloat16'))
    variables = rec.init_variables(jax.random.PRNGKey(0), (2, h, w, c))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, h, w, c)), jnp.bfloat16)
    mod = rec.module

    def p_stem(v, i):
        x, _ = mod.apply(v, i, train=False, method=lambda m, im, train:
                         m.backbone.stem_and_head(im, train=train))
        return x

    def p_est(v, i):
        def f(m, im, train):
            x, skips = m.backbone.stem_and_head(im, train=train)
            return m.tpsnet.estimate_only(x, skips, train=train) \
                if hasattr(m.tpsnet, 'estimate_only') else \
                m.tpsnet(x, skips, train=train)['output']
        return mod.apply(v, i, train=False, method=f)

    def p_tail(v, i):
        def f(m, im, train):
            x, skips = m.backbone.stem_and_head(im, train=train)
            x = m.tpsnet(x, skips, train=train)['output']
            return m.backbone.tail(x, train=train)
        return mod.apply(v, i, train=False, method=f)

    prev = {}
    for name, fn in (('stem', p_stem), ('stem+TPS', p_est),
                     ('stem+TPS+tail', p_tail)):
        try:
            comp = jax.jit(fn).lower(variables, img).compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = ca.get('flops', float('nan'))
            by = ca.get('bytes accessed', float('nan'))
            print(f'{name:16s} flops={fl/1e12:8.3f} T  bytes={by/1e9:7.2f} G'
                  f'  mxu@197T={fl/197e12*1e3:6.2f} ms'
                  f'  hbm@819GBs={by/819e9*1e3:6.2f} ms', flush=True)
        except Exception as e:
            print(name, 'FAILED', type(e).__name__, e, flush=True)

if __name__ == '__main__':
    main()
