"""A/B the decode paths' end-to-end accuracy on the trained flagship.

Evidence script for ROADMAP.md / VERDICT r2 Weak#1: the 'fused40_bf16'
whole-decode Pallas kernel (the API default on TPU) and the int8-KV
'fused40' variant must be accuracy-neutral vs the torch-bit-matched
'steps' XLA loop. Reports, per mode: word-acc, prediction agreement with
'steps', per-step argmax flips, and the steps-path top-2 score gap at
every flip (flips are only acceptable at exact quantization ties).

Usage:  python scratch/eval_decode_modes.py [--ckpt scratch/flagship_toy.msgpack]
            [--n 4096] [--batch 512] [--modes steps fused40_bf16 fused40]
(The dataset is re-rendered with the same seed as training.)
"""
from __future__ import annotations

import argparse
import json

import numpy as np

from common import (CKPT_DEFAULT, build_model_cfg, enable_compile_cache,
                    load_params, render_dataset)


def predict_all(rec, variables, imgs, batch, dtype):
    import jax.numpy as jnp
    outs = []
    for i in range(0, len(imgs), batch):
        img = jnp.asarray(imgs[i:i + batch], dtype)
        n = img.shape[0]
        if n < batch:
            img = jnp.concatenate([img, img[-1:].repeat(batch - n, 0)], 0)
        outs.append(np.asarray(rec.predict(variables, img),
                               np.float32)[:n])
    return np.concatenate(outs, 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', default=None,
                    help='defaults per --model (flagship_toy/satrn_toy)')
    ap.add_argument('--model', choices=['nrtr', 'satrn'], default='nrtr')
    ap.add_argument('--n', type=int, default=4096)
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--modes', nargs='+',
                    default=['steps', 'fused40_bf16', 'fused40'])
    args = ap.parse_args()

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from tps_pp_tpu.apis.recognizer import build_recognizer

    _, (h, w, c), default_ckpt = build_model_cfg(args.model)
    if args.ckpt is None:
        args.ckpt = default_ckpt
    imgs, texts = render_dataset(args.n, seed=args.seed, h=h, w=w)

    results = {}
    scores_by_mode = {}
    for mode in args.modes:
        kv = 'int8' if mode == 'fused40' else 'bfloat16'
        cfg, _, _ = build_model_cfg(args.model, dtype='bfloat16',
                                    kv_dtype=kv, decode_mode=mode)
        rec = build_recognizer(cfg)
        variables = rec.init_variables(jax.random.PRNGKey(0), (2, h, w, c))
        variables = load_params(args.ckpt, variables)
        assert rec.resolved_decode_mode() == mode, (
            f'{mode} resolved to {rec.resolved_decode_mode()}')
        scores = predict_all(rec, variables, imgs, args.batch, jnp.bfloat16)
        idxs, _ = rec.label_convertor.tensor2idx(scores)
        preds = rec.label_convertor.idx2str(idxs)
        acc = float(np.mean([p == t for p, t in zip(preds, texts)]))
        scores_by_mode[mode] = scores
        results[mode] = dict(word_acc=round(acc, 4), preds=preds)
        print(f'{mode}: word-acc {acc:.4f}', flush=True)

    if 'steps' in results:
        base = scores_by_mode['steps']
        base_arg = base.argmax(-1)
        top2 = np.partition(base, -2, axis=-1)[..., -2:]
        gap = top2[..., 1] - top2[..., 0]  # top1 - top2 in steps scores
        base_preds = results['steps']['preds']
        for mode in args.modes:
            if mode == 'steps':
                continue
            arg = scores_by_mode[mode].argmax(-1)
            flips = arg != base_arg
            n_flips = int(flips.sum())
            agree = float(np.mean([a == b for a, b in zip(
                results[mode]['preds'], base_preds)]))
            gaps = np.sort(gap[flips])[::-1][:10]
            print(json.dumps(dict(
                mode=mode,
                word_acc=results[mode]['word_acc'],
                delta_acc=round(results[mode]['word_acc']
                                - results['steps']['word_acc'], 4),
                agreement=round(agree, 4),
                argmax_flips=n_flips,
                flip_rate=round(n_flips / base_arg.size, 8),
                steps_top2_gap_at_flips=[float(g) for g in gaps],
            )), flush=True)


if __name__ == '__main__':
    main()
