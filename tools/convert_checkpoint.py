#!/usr/bin/env python
"""One-command reference-checkpoint conversion (.pth -> orbax / .npz).

The moment released PyTorch weights are available, accuracy parity is one
command (reference recipe: README.md:61-65 + apis/inference.py:19-56):

    python tools/convert_checkpoint.py CKPT.pth OUT --config CONFIG.py

* Auto-selects the rule table from the config's reference ``type=`` names
  (utils/torch_convert.rules_for_config: crnn[_tps] / nrtr[_tps++] / sar /
  satrn / robust_scanner / abinet families).
* OUT ending in ``.npz`` writes the single-file format; anything else is
  an orbax checkpoint directory (weights-only, step 0).
* Verifies the round trip before exiting: reloads OUT through
  ``init_recognizer`` and asserts predictions on random crops are
  IDENTICAL to the in-memory conversion (and finite). A config/checkpoint
  mismatch fails loudly (uncovered-params check), not silently.

``tools/test.py CONFIG CKPT.pth --eval acc`` also accepts the .pth
directly (init_recognizer converts on the fly); this CLI exists to
publish the converted artifact once instead of converting per run.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('pth', help='reference torch checkpoint (.pth)')
    p.add_argument('out', help='output: *.npz file or orbax directory')
    p.add_argument('--config', required=True,
                   help='the reference-layout config the weights belong to')
    p.add_argument('--input-shape', type=int, nargs=3, default=None,
                   metavar=('H', 'W', 'C'),
                   help='override the config input shape')
    p.add_argument('--no-verify', action='store_true',
                   help='skip the reload-and-predict round-trip check')
    args = p.parse_args()

    import jax
    import numpy as np

    from tps_pp_tpu.apis.inference import init_recognizer
    from tps_pp_tpu.apis.recognizer import build_recognizer
    from tps_pp_tpu.config import load_config
    from tps_pp_tpu.utils.checkpoint import CheckpointManager, save_variables
    from tps_pp_tpu.utils.torch_convert import convert_checkpoint, load_pth

    cfg = load_config(args.config)
    rec = build_recognizer(cfg['model'])
    shape = tuple(args.input_shape or cfg.get('input_shape') or (32, 128, 3))
    init = rec.init_variables(jax.random.PRNGKey(0), (1, *shape))

    sd = load_pth(args.pth)
    variables = convert_checkpoint(sd, rec, init)
    n_params = sum(np.asarray(x).size for x in
                   jax.tree_util.tree_leaves(variables['params']))
    print(f'converted {len(sd)} torch tensors -> '
          f'{n_params:,} model parameters')

    if args.out.endswith('.npz'):
        save_variables(args.out, variables)
    else:
        # (orbax StandardSave holds arrays only — provenance strings go to
        # stdout, not into the checkpoint)
        CheckpointManager(args.out).save_weights(variables)
    print(f'wrote {args.out} (from {os.path.abspath(args.pth)})')

    if not args.no_verify:
        rec2, reloaded = init_recognizer(args.config, args.out,
                                         input_shape=(1, *shape))
        rng = np.random.default_rng(0)
        img = jax.numpy.asarray(
            rng.standard_normal((2, *shape)), jax.numpy.float32)
        vr = jax.numpy.ones((2,), jax.numpy.float32)
        out_mem = np.asarray(rec.predict(variables, img, vr))
        out_file = np.asarray(rec2.predict(reloaded, img, vr))
        np.testing.assert_array_equal(out_mem, out_file)
        assert np.isfinite(out_mem).all(), 'non-finite predictions'
        print('round-trip verified: file-loaded predictions identical '
              'to the in-memory conversion')


if __name__ == '__main__':
    main()
