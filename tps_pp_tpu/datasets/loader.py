"""Annotation loaders + line parsers.

Re-implements reference ``mmocr/datasets/utils/loader.py:9-115`` (HardDisk /
Lmdb loaders) and ``utils/parser.py:9-72`` (LineStrParser/LineJsonParser).
LMDB access is lazy per-worker like the reference's LmdbAnnFileBackend
(loader.py:95-115) and cleanly gated when python-lmdb is absent. A
first-party indexed binary format (PackedLoader, see packed.py) covers the
zero-dependency path.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from ..registry import LOADERS, PARSERS


@PARSERS.register_module()
class LineStrParser:
    """Split a text line into a dict by separator (reference parser.py:9-46)."""

    def __init__(self, keys=('filename', 'text'), keys_idx=(0, 1),
                 separator=' ', **kwargs):
        assert len(keys) > 0 and len(keys) == len(keys_idx)
        self.keys = list(keys)
        self.keys_idx = list(keys_idx)
        self.separator = separator
        from ..utils.string_util import StringStrip
        self.strip_cls = StringStrip(**kwargs)

    def get_item(self, data_ret: List[str], index: int) -> Dict:
        map_index = index % len(data_ret)
        line_str = self.strip_cls(data_ret[map_index])
        for sub in self.separator:
            if sub != ' ':
                line_str = line_str.replace(sub, ' ')
        line = line_str.split()
        if len(line) <= max(self.keys_idx):
            raise ValueError(f'key index {max(self.keys_idx)} out of range '
                             f'for line: {line_str}')
        return {k: line[i] for k, i in zip(self.keys, self.keys_idx)}


@PARSERS.register_module()
class LineJsonParser:
    """Parse a JSON line keeping selected keys (reference parser.py:50-72)."""

    def __init__(self, keys=('filename', 'text')):
        assert len(keys) > 0
        self.keys = list(keys)

    def get_item(self, data_ret: List[str], index: int) -> Dict:
        map_index = index % len(data_ret)
        obj = json.loads(data_ret[map_index])
        missing = [k for k in self.keys if k not in obj]
        if missing:
            raise ValueError(f'keys {missing} not in line json: {obj}')
        return {k: obj[k] for k in self.keys}


class BaseLoader:
    """Loader protocol: len() + [index] -> info dict."""

    def __init__(self, ann_file: str, parser: Dict, repeat: int = 1):
        assert isinstance(ann_file, str) and ann_file
        assert repeat > 0
        self.ann_file = ann_file
        self.repeat = repeat
        self.parser = PARSERS.build(parser)
        self.ordered_indexes = self._load(ann_file)

    def __len__(self):
        return int(len(self.ordered_indexes) * self.repeat)

    def __getitem__(self, index: int) -> Dict:
        return self.parser.get_item(self.ordered_indexes, index)

    def __iter__(self):
        self._n = 0
        return self

    def __next__(self):
        if self._n < len(self):
            data = self[self._n]
            self._n += 1
            return data
        raise StopIteration

    def _load(self, ann_file):
        raise NotImplementedError


@LOADERS.register_module()
class HardDiskLoader(BaseLoader):
    """Load a txt annotation file into RAM (reference loader.py:55-63)."""

    def _load(self, ann_file):
        if not os.path.exists(ann_file):
            raise FileNotFoundError(ann_file)
        with open(ann_file, encoding='utf-8') as f:
            return [line.rstrip('\r\n') for line in f if line.strip()]


class _LmdbBackend:
    """Lazy-opening LMDB txn lookup, picklable across dataloader workers
    (reference LmdbAnnFileBackend, loader.py:95-115)."""

    def __init__(self, lmdb_path: str, coding: str = 'utf8'):
        self.lmdb_path = lmdb_path
        self.coding = coding
        self._env = None
        env = self._get_env()
        with env.begin(write=False) as txn:
            self.total_number = int(
                txn.get('total_number'.encode(self.coding)).decode(
                    self.coding))
        env.close()
        self._env = None

    def _get_env(self):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError(
                'python-lmdb is not installed; use HardDiskLoader (txt) or '
                'PackedLoader (first-party indexed format) instead') from e
        return lmdb.open(self.lmdb_path, max_readers=1, readonly=True,
                         lock=False, readahead=False, meminit=False)

    def __len__(self):
        return self.total_number

    def __getitem__(self, index: int) -> str:
        if self._env is None:
            self._env = self._get_env()
        with self._env.begin(write=False) as txn:
            return txn.get(str(index).encode(self.coding)).decode(self.coding)

    def __getstate__(self):
        state = self.__dict__.copy()
        state['_env'] = None
        return state


@LOADERS.register_module()
class LmdbLoader(BaseLoader):
    """Annotation lines stored in an LMDB (reference loader.py:67-92)."""

    def _load(self, ann_file):
        return _LmdbBackend(ann_file)


class _PackedBackend:
    """Annotation lines in the first-party TPSPACK1 format (C++ mmap reader
    in native/tps_native.cpp; zero external deps)."""

    def __init__(self, path: str):
        from ..native import PackedReader
        self._reader = PackedReader(path)

    def __len__(self):
        return len(self._reader)

    def __getitem__(self, index: int) -> str:
        return self._reader[index].decode('utf-8')


@LOADERS.register_module()
class PackedLoader(BaseLoader):
    """First-party replacement for LmdbLoader: indexed binary annotation
    store read through the native mmap reader."""

    def _load(self, ann_file):
        return _PackedBackend(ann_file)
