#!/usr/bin/env python
"""Convert annotation txt (or an LMDB) into the first-party TPSPACK1 store
(reference analog: tools/data/utils/lmdb_converter + mmocr lmdb_util).

    python tools/data/pack_converter.py label.txt label.pack
    python tools/data/pack_converter.py label.lmdb label.pack --from-lmdb
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

from tps_pp_tpu.native import write_packed  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('--from-lmdb', action='store_true')
    args = p.parse_args()

    if args.from_lmdb:
        import lmdb
        env = lmdb.open(args.src, readonly=True, lock=False)
        records = []
        with env.begin() as txn:
            total = int(txn.get(b'total_number').decode())
            for i in range(total):
                records.append(txn.get(str(i).encode()))
    else:
        with open(args.src, encoding='utf-8') as f:
            records = [line.rstrip('\r\n').encode('utf-8')
                       for line in f if line.strip()]
    write_packed(args.dst, records)
    print(f'wrote {len(records)} records -> {args.dst}')


if __name__ == '__main__':
    main()
