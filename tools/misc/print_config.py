#!/usr/bin/env python
"""Print a fully-resolved config (reference tools/misc/print_config.py)."""
import argparse
import os
import pprint
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    args = p.parse_args()
    from tps_pp_tpu.config import load_config
    cfg = load_config(args.config)

    def plain(x):
        if isinstance(x, dict):
            return {k: plain(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(plain(v) for v in x)
        return x

    pprint.pprint(plain(dict(cfg)), width=79)


if __name__ == '__main__':
    main()
