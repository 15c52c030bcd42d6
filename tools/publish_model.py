#!/usr/bin/env python
"""Publish a training checkpoint as a weights-only artifact
(reference ``tools/publish_model.py``: strip optimizer state, append a
content hash).

    python tools/publish_model.py WORK_DIR OUT_PREFIX \
        --config CONFIG [--input-shape N H W C]
"""
import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser()
    p.add_argument('work_dir')
    p.add_argument('out_prefix')
    p.add_argument('--config', required=True)
    p.add_argument('--input-shape', type=int, nargs=4,
                   default=(1, 32, 128, 3))
    args = p.parse_args()

    import jax
    from tps_pp_tpu.config import load_config
    from tps_pp_tpu.apis.recognizer import build_recognizer
    from tps_pp_tpu.utils.checkpoint import CheckpointManager, save_variables

    cfg = load_config(args.config)
    rec = build_recognizer(cfg['model'])
    variables = rec.init_variables(jax.random.PRNGKey(0),
                                   tuple(args.input_shape))
    variables = CheckpointManager(args.work_dir).load_weights(variables)

    tmp = args.out_prefix + '.npz'
    save_variables(tmp, variables)
    with open(tmp, 'rb') as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:8]
    final = f'{args.out_prefix}-{digest}.npz'
    os.rename(tmp, final)
    print('published', final)


if __name__ == '__main__':
    main()
