#!/usr/bin/env python
"""Training CLI (reference ``tools/train.py``).

    python tools/train.py CONFIG [--work-dir WD] [--load-from CKPT]
        [--resume-from CKPT] [--seed N] [--cfg-options k=v ...]

Multi-host: run one process per host with the same command;
``jax.distributed`` is initialized when JAX_COORDINATOR_ADDRESS (+
JAX_NUM_PROCESSES/JAX_PROCESS_ID) is exported, or when Slurm launched more
than one task (jax auto-detects Slurm coordination from the SLURM_* env
vars, so slurm_train.sh needs no manual env setup). SPMD needs no per-rank
wrappers.
"""
import argparse
import ast
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description='Train a text recognizer')
    p.add_argument('config')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--load-from', default=None)
    p.add_argument('--resume-from', default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def main():
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    args = parse_args()

    from tps_pp_tpu.utils.platform import (apply_jax_platform_env,
                                           maybe_init_distributed)
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    maybe_init_distributed()

    from tps_pp_tpu.config import load_config, merge_cli_options
    from tps_pp_tpu.apis.recognizer import build_recognizer
    from tps_pp_tpu.apis.train import train_recognizer
    from tps_pp_tpu.datasets import build_dataset

    cfg = load_config(args.config)
    options = {}
    for kv in args.cfg_options:
        k, v = kv.split('=', 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        options[k] = v
    merge_cli_options(cfg, options)

    from tps_pp_tpu.apis.train_kie import (KIE_TYPES, NER_TYPES,
                                           build_task_dataset, train_kie,
                                           train_ner)
    if cfg['model'].get('type') in KIE_TYPES + NER_TYPES:
        # KIE/NER configs train through the same CLI (the reference routes
        # SDMGR and NerClassifier through tools/train.py)
        train_fn = (train_kie if cfg['model']['type'] in KIE_TYPES
                    else train_ner)
        train_ds = build_task_dataset(cfg, 'train')
        bs = cfg.get('data', {}).get('samples_per_gpu', 4)
        train_fn(cfg, train_ds, work_dir=args.work_dir, batch_size=bs,
                 seed=args.seed)
        return

    from tps_pp_tpu.apis.train_det import DET_TYPES, train_detector
    if cfg['model'].get('type') in DET_TYPES:
        # detection configs go through the det loop (the reference trains
        # every task via the same CLI, tools/train.py:96-214)
        from tps_pp_tpu.datasets import TextDetDataset
        d = dict(cfg['data']['train']) if 'data' in cfg else {}
        d.pop('type', None)
        train_ds = TextDetDataset(**d)
        train_detector(cfg, train_ds, work_dir=args.work_dir,
                       seed=args.seed)
        return

    rec = build_recognizer(cfg['model'])
    train_ds = build_dataset(cfg['data']['train'])
    val_ds = (build_dataset(cfg['data']['val'], dict(test_mode=True))
              if 'val' in cfg.get('data', {}) else None)

    train_cfg = dict(
        samples_per_gpu=cfg['data'].get('samples_per_gpu', 64),
        total_epochs=cfg.get('total_epochs', 12),
        optimizer=cfg.get('optimizer', dict(type='Adam', lr=1e-4)),
        lr_config=cfg.get('lr_config', {}),
        log_interval=cfg.get('log_config', {}).get('interval', 50),
        input_shape=tuple(cfg.get('input_shape', (32, 128, 3))),
        workers_per_gpu=cfg['data'].get('workers_per_gpu', 0),
        # activation rematerialization: 'none'|'dots'|'full'
        # (parallel/train.py make_train_step)
        remat=cfg.get('remat', 'none'),
    )
    train_recognizer(rec, train_ds, train_cfg, val_dataset=val_ds,
                     work_dir=args.work_dir, resume_from=args.resume_from,
                     load_from=args.load_from, seed=args.seed)


if __name__ == '__main__':
    main()
