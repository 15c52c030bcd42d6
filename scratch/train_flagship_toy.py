"""Train the flagship NRTR+TPS++ to memorize 4096 synthetic word crops.

Evidence script for ROADMAP.md: with zero egress and no data mounts, the
honest end-to-end accuracy check is memorizing rendered text — the trained
checkpoint then feeds eval_decode_modes.py (decode-path accuracy
neutrality) and probe_early_exit.py (EOS-dependent kernel timing).

Usage:  python scratch/train_flagship_toy.py [--n 4096] [--batch 256]
            [--epochs 60] [--lr 3e-4] [--out scratch/flagship_toy.msgpack]
Stops early once train word-acc >= --target (default 0.99) and saves the
best checkpoint. Runs on the one real TPU chip (or CPU with
JAX_PLATFORMS=cpu, much slower).
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from common import (build_model_cfg, enable_compile_cache, render_dataset,
                    save_params)


def word_acc(rec, variables, imgs, texts, batch, dtype):
    import jax.numpy as jnp
    correct = 0
    for i in range(0, len(texts), batch):
        img = jnp.asarray(imgs[i:i + batch], dtype)
        if img.shape[0] < batch:  # reuse the compiled program
            pad = batch - img.shape[0]
            img = jnp.concatenate([img, img[-1:].repeat(pad, 0)], 0)
        scores = rec.predict(variables, img)
        idxs, _ = rec.label_convertor.tensor2idx(np.asarray(
            scores, np.float32)[:len(texts[i:i + batch])])
        preds = rec.label_convertor.idx2str(idxs)
        correct += sum(p == t for p, t in zip(preds, texts[i:i + batch]))
    return correct / len(texts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=4096)
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--epochs', type=int, default=80)
    ap.add_argument('--lr', type=float, default=3e-4)
    ap.add_argument('--target', type=float, default=0.99)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--model', choices=['nrtr', 'satrn'], default='nrtr')
    ap.add_argument('--out', default=None,
                    help='defaults per --model (flagship_toy/satrn_toy)')
    ap.add_argument('--length-dist', choices=['uniform', 'real'],
                    default='uniform',
                    help="'real' = 1-25-char lognormal word lengths")
    ap.add_argument('--max-len', type=int, default=8)
    args = ap.parse_args()

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from tps_pp_tpu.apis.recognizer import build_recognizer
    from tps_pp_tpu.parallel import TrainState, build_optimizer, \
        make_train_step

    cfg, (h, w, c), default_out = build_model_cfg(args.model,
                                                  dtype='bfloat16')
    if args.out is None:
        args.out = default_out
    imgs, texts = render_dataset(args.n, seed=args.seed, h=h, w=w,
                                 max_len=args.max_len,
                                 length_dist=args.length_dist)
    print(f'rendered {args.n} crops; first 3: {texts[:3]}', flush=True)

    # bf16 compute / fp32 params — the same dtype split bench.py measures
    rec = build_recognizer(cfg)
    dtype = jnp.bfloat16
    variables = rec.init_variables(jax.random.PRNGKey(args.seed),
                                   (2, h, w, c))
    steps_per_epoch = args.n // args.batch
    tx, _ = build_optimizer(
        dict(type='Adam', lr=args.lr, grad_clip=dict(max_norm=5.0),
             lr_config=dict(warmup_steps=100)),
        steps_per_epoch=steps_per_epoch)
    state = TrainState.create(variables, tx)
    train_step = make_train_step(rec)
    rng = jax.random.PRNGKey(args.seed + 1)

    order_rng = np.random.default_rng(args.seed + 2)
    best = 0.0
    t_start = time.time()
    for epoch in range(args.epochs):
        order = order_rng.permutation(args.n)
        t0 = time.time()
        losses = []
        for it in range(steps_per_epoch):
            sel = order[it * args.batch:(it + 1) * args.batch]
            td = rec.label_convertor.str2tensor([texts[j] for j in sel])
            batch = {
                'img': jnp.asarray(imgs[sel], dtype),
                'valid_ratio': jnp.ones((args.batch,), jnp.float32),
                'padded_targets': jnp.asarray(td['padded_targets']),
            }
            state, metrics = train_step(state, batch, rng)
            losses.append(metrics['loss'])
        loss = float(np.mean([float(v) for v in losses]))
        dt = time.time() - t0
        msg = (f'epoch {epoch} loss {loss:.4f} '
               f'{dt / steps_per_epoch:.3f}s/step')
        if loss < 0.15 or epoch % 5 == 4:
            acc = word_acc(rec, state.variables(), imgs, texts,
                           args.batch, dtype)
            msg += f' word-acc {acc:.4f}'
            if acc > best:
                best = acc
                save_params(args.out, state.variables())
            if acc >= args.target:
                print(msg, flush=True)
                break
        print(msg, flush=True)

    print(f'best word-acc {best:.4f} in {time.time() - t_start:.0f}s; '
          f'checkpoint -> {args.out}', flush=True)
    return 0 if best >= args.target else 1


if __name__ == '__main__':
    sys.exit(main())
