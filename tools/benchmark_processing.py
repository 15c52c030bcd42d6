#!/usr/bin/env python
"""Data-pipeline throughput profiler (reference
``tools/benchmark_processing.py`` — a cProfile harness; this also reports
samples/sec which is what actually matters for keeping the TPU fed).

    python tools/benchmark_processing.py CONFIG [--n 200] [--profile]
"""
import argparse
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--n', type=int, default=200)
    p.add_argument('--profile', action='store_true')
    p.add_argument('--workers', type=int, default=0,
                   help='DataLoader process workers; 0 = in-process. '
                        'Comma lists compare, e.g. --workers 0 (then '
                        'rerun with 4, 8) or use --sweep')
    p.add_argument('--sweep', default=None,
                   help='comma-separated worker counts to compare, '
                        'e.g. 0,2,4,8')
    p.add_argument('--batch-size', type=int, default=None)
    args = p.parse_args()

    from tps_pp_tpu.config import load_config
    from tps_pp_tpu.datasets import build_dataset
    from tps_pp_tpu.datasets.ocr_dataset import DataLoader

    cfg = load_config(args.config)
    ds = build_dataset(cfg['data']['train'])
    batch = args.batch_size or cfg['data'].get('samples_per_gpu', 64)

    def run_loader(workers):
        loader = DataLoader(ds, batch, shuffle=True, seed=0,
                            num_workers=workers)
        # warm the pool so process startup isn't billed to throughput
        next(iter(loader))
        t0 = time.perf_counter()
        n = epoch = 0
        while n < args.n:  # loop epochs until --n samples are drawn
            loader.set_epoch(epoch)
            for host_batch in loader:
                n += host_batch['n_real']
                if n >= args.n:
                    break
            epoch += 1
        dt = time.perf_counter() - t0
        loader.close()
        print(f'workers={workers}: {n} samples in {dt:.2f}s -> '
              f'{n / max(dt, 1e-9):.1f} samples/sec')

    def run():
        if args.sweep:
            for w in [int(x) for x in args.sweep.split(',')]:
                run_loader(w)
        else:
            run_loader(args.workers)

    if args.profile:
        pr = cProfile.Profile()
        pr.enable()
        run()
        pr.disable()
        pstats.Stats(pr).sort_stats('cumulative').print_stats(25)
    else:
        run()


if __name__ == '__main__':
    main()
