"""ctypes bindings for the first-party C++ runtime (native/tps_native.cpp).

Auto-builds the shared library with g++ on first use (cached next to the
source); every entry point has a pure-Python fallback so the framework works
without a toolchain. Replaces the reference's C/C++ dependency surface:
rapidfuzz levenshtein (SURVEY §2.9) and the LMDB store (PackedDataset is the
first-party indexed-record format).
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import List, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native')
_SRC = os.path.join(_NATIVE_DIR, 'tps_native.cpp')
_LIB = os.path.join(_NATIVE_DIR, 'libtps_native.so')

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(['g++', '-O3', '-shared', '-fPIC', '-o', _LIB, _SRC],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC) and
            os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        if not _build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.levenshtein_u32.restype = ctypes.c_int64
        lib.levenshtein_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64]
        lib.packed_open.restype = ctypes.c_void_p
        lib.packed_open.argtypes = [ctypes.c_char_p]
        lib.packed_count.restype = ctypes.c_int64
        lib.packed_count.argtypes = [ctypes.c_void_p]
        lib.packed_get.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.packed_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.POINTER(ctypes.c_int64)]
        lib.packed_close.argtypes = [ctypes.c_void_p]
        lib.ctc_collapse.restype = ctypes.c_int64
        lib.ctc_collapse.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def levenshtein(a: str, b: str) -> int:
    lib = get_lib()
    if lib is None:
        from .evaluation.ocr_metric import _levenshtein_py
        return _levenshtein_py(a, b)
    ua = (ctypes.c_uint32 * max(len(a), 1))(*[ord(c) for c in a])
    ub = (ctypes.c_uint32 * max(len(b), 1))(*[ord(c) for c in b])
    return int(lib.levenshtein_u32(ua, len(a), ub, len(b)))


_PACK_MAGIC = b'TPSPACK1'


def write_packed(path: str, records: List[bytes]):
    """Write the TPSPACK1 indexed-record format (see tps_native.cpp)."""
    with open(path, 'wb') as f:
        f.write(_PACK_MAGIC)
        f.write(struct.pack('<Q', len(records)))
        header = 16 + 8 * (len(records) + 1)
        off = header
        offsets = []
        for r in records:
            offsets.append(off)
            off += len(r)
        offsets.append(off)
        f.write(struct.pack(f'<{len(offsets)}Q', *offsets))
        for r in records:
            f.write(r)


class PackedReader:
    """mmap'd record reader; picklable across dataloader workers (the lazy
    reopen mirrors the reference's LmdbAnnFileBackend, loader.py:95-115)."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        self._handle = None
        self._count = None
        self._open()

    def _open(self):
        lib = get_lib()
        if lib is not None:
            h = lib.packed_open(self.path.encode())
            if h:
                self._handle = h
                self._count = int(lib.packed_count(
                    ctypes.c_void_p(self._handle)))
                return
        # pure-python fallback
        with open(self.path, 'rb') as f:
            magic = f.read(8)
            assert magic == _PACK_MAGIC, f'not a TPSPACK1 file: {self.path}'
            (count,) = struct.unpack('<Q', f.read(8))
            self._count = count
            self._py_offsets = struct.unpack(
                f'<{count + 1}Q', f.read(8 * (count + 1)))

    def __len__(self):
        return self._count

    def __getitem__(self, index: int) -> bytes:
        if index < 0 or index >= self._count:
            raise IndexError(index)
        lib = get_lib()
        if self._handle is not None and lib is not None:
            ln = ctypes.c_int64()
            ptr = lib.packed_get(ctypes.c_void_p(self._handle), index,
                                 ctypes.byref(ln))
            if ln.value < 0:
                raise IndexError(index)
            return ctypes.string_at(ptr, ln.value)
        with open(self.path, 'rb') as f:
            f.seek(self._py_offsets[index])
            return f.read(self._py_offsets[index + 1] -
                          self._py_offsets[index])

    def __getstate__(self):
        return {'path': self.path}

    def __setstate__(self, state):
        self.path = state['path']
        self._handle = None
        self._count = None
        self._open()

    def __del__(self):
        lib = get_lib()
        if getattr(self, '_handle', None) and lib is not None:
            lib.packed_close(ctypes.c_void_p(self._handle))
            self._handle = None


def ctc_collapse(pred, blank: int = 0) -> List[int]:
    """Greedy CTC collapse (drop blanks + repeats) of an argmax sequence."""
    import numpy as np
    pred = np.ascontiguousarray(pred, dtype=np.int32)
    lib = get_lib()
    if lib is None:
        out, prev = [], blank
        for v in pred.tolist():
            if v != prev and v != blank:
                out.append(v)
            prev = v
        return out
    buf = np.empty_like(pred)
    n = lib.ctc_collapse(
        pred.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(pred),
        blank, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return buf[:n].tolist()
