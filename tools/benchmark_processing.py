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
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--n', type=int, default=200)
    p.add_argument('--profile', action='store_true')
    args = p.parse_args()

    from tps_pp_tpu.config import load_config
    from tps_pp_tpu.datasets import build_dataset

    cfg = load_config(args.config)
    ds = build_dataset(cfg['data']['train'])

    def run():
        t0 = time.perf_counter()
        for i in range(args.n):
            ds[i % len(ds)]
        dt = time.perf_counter() - t0
        print(f'{args.n} samples in {dt:.2f}s -> '
              f'{args.n / dt:.1f} samples/sec/worker')

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
