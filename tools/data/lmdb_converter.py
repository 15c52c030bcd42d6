#!/usr/bin/env python
"""label.txt <-> LMDB / TPSPACK1 annotation-store conversion
(reference tools/data/utils/txt2lmdb.py + mmocr/utils/lmdb_util.py).

The reference trains from LMDB label stores (LmdbLoader,
datasets/utils/loader.py:67-115). This tool writes either the same
line-per-key LMDB layout (requires the optional python-lmdb) or the
first-party TPSPACK1 mmap store (no dependency), and can convert between
them.

    python tools/data/lmdb_converter.py txt2lmdb label.txt label.lmdb
    python tools/data/lmdb_converter.py txt2pack label.txt label.pack
    python tools/data/lmdb_converter.py lmdb2txt label.lmdb label.txt
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def _read_lines(path):
    with open(path, encoding='utf-8') as f:
        return [ln.rstrip('\n') for ln in f if ln.strip()]


def txt2lmdb(txt_path, lmdb_path):
    import lmdb
    lines = _read_lines(txt_path)
    env = lmdb.open(lmdb_path, map_size=1 << 34)
    with env.begin(write=True) as txn:
        for i, line in enumerate(lines):
            txn.put(str(i).encode(), line.encode('utf-8'))
        txn.put(b'total_number', str(len(lines)).encode())
    env.close()
    return len(lines)


def lmdb2txt(lmdb_path, txt_path):
    import lmdb
    env = lmdb.open(lmdb_path, readonly=True, lock=False)
    with env.begin() as txn:
        total = int(txn.get(b'total_number').decode())
        lines = [txn.get(str(i).encode()).decode('utf-8')
                 for i in range(total)]
    env.close()
    with open(txt_path, 'w', encoding='utf-8') as f:
        f.write('\n'.join(lines) + '\n')
    return total


def txt2pack(txt_path, pack_path):
    from tps_pp_tpu.native import write_packed
    lines = _read_lines(txt_path)
    write_packed(pack_path, [ln.encode('utf-8') for ln in lines])
    return len(lines)


def pack2txt(pack_path, txt_path):
    from tps_pp_tpu.native import PackedReader
    reader = PackedReader(pack_path)
    lines = [reader[i].decode('utf-8') for i in range(len(reader))]
    with open(txt_path, 'w', encoding='utf-8') as f:
        f.write('\n'.join(lines) + '\n')
    return len(lines)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('mode', choices=['txt2lmdb', 'lmdb2txt', 'txt2pack',
                                    'pack2txt'])
    p.add_argument('src')
    p.add_argument('dst')
    args = p.parse_args()
    n = {'txt2lmdb': txt2lmdb, 'lmdb2txt': lmdb2txt,
         'txt2pack': txt2pack, 'pack2txt': pack2txt}[args.mode](args.src,
                                                                args.dst)
    print(f'{args.mode}: {n} records {args.src} -> {args.dst}')


if __name__ == '__main__':
    main()
