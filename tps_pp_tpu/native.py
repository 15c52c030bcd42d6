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
        lib.contour_expand.restype = None
        lib.contour_expand.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.pixel_group.restype = None
        lib.pixel_group.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_int32)]
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
        # pure-python fallback: keep one mmap open (re-opening the file
        # per record costs an open/seek/read/close round trip on the
        # dataloader hot path)
        import mmap as _mmap
        f = open(self.path, 'rb')
        magic = f.read(8)
        assert magic == _PACK_MAGIC, f'not a TPSPACK1 file: {self.path}'
        (count,) = struct.unpack('<Q', f.read(8))
        self._count = count
        self._py_offsets = struct.unpack(
            f'<{count + 1}Q', f.read(8 * (count + 1)))
        self._py_mmap = _mmap.mmap(f.fileno(), 0,
                                   access=_mmap.ACCESS_READ)
        f.close()   # the mmap keeps its own reference

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
        return self._py_mmap[self._py_offsets[index]:
                             self._py_offsets[index + 1]]

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


def contour_expand(kernel_masks, labels, min_kernel_area: int,
                   region_num: int):
    """PSENet progressive scale expansion (first-party equivalent of
    mmcv.ops.contour_expand, reference pse_postprocessor.py:6,69).

    Args:
      kernel_masks: (K, H, W) uint8, index 0 = largest kernel (text mask),
        K-1 = smallest.
      labels: (H, W) int32, connected components of the smallest kernel.
    Returns the expanded (H, W) int32 label map.
    """
    import numpy as np
    kernel_masks = np.ascontiguousarray(kernel_masks, np.uint8)
    out = np.ascontiguousarray(labels, np.int32).copy()
    k, h, w = kernel_masks.shape
    lib = get_lib()
    if lib is not None:
        lib.contour_expand(
            kernel_masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            k, h, w, int(min_kernel_area), int(region_num),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    # numpy fallback: per-level label propagation until fixpoint
    if min_kernel_area > 0:
        areas = np.bincount(out.reshape(-1), minlength=region_num + 1)
        small = np.isin(out, np.nonzero(areas < min_kernel_area)[0]) & (out > 0)
        out[small] = 0
    for lvl in range(k - 2, -1, -1):
        m = kernel_masks[lvl] > 0
        while True:
            grow = np.zeros_like(out)
            for shift, axis in (((1,), 0), ((-1,), 0), ((1,), 1), ((-1,), 1)):
                rolled = np.roll(out, shift, axis=axis)
                if axis == 0:
                    rolled[0 if shift[0] == 1 else -1, :] = 0
                else:
                    rolled[:, 0 if shift[0] == 1 else -1] = 0
                grow = np.where((grow == 0) & (out == 0) & m & (rolled > 0),
                                rolled, grow)
            if not grow.any():
                break
            out = np.where(grow > 0, grow, out)
    return out


def pixel_group(score, mask, embedding, kernel_label, kernel_contour,
                kernel_region_num: int, distance_threshold: float):
    """PANet pixel aggregation (first-party equivalent of
    mmcv.ops.pixel_group, reference pan_postprocessor.py:5,63).

    Returns a list (indexed 1..region_num) of
    ``[avg_score, point_count, x0, y0, x1, y1, ...]`` per text instance —
    the mmcv return layout consumed by the postprocessor.
    """
    import numpy as np
    score = np.ascontiguousarray(score, np.float32)
    mask = np.ascontiguousarray(mask, np.uint8)
    embedding = np.ascontiguousarray(embedding, np.float32)
    labels = np.ascontiguousarray(kernel_label, np.int32).copy()
    contour = np.ascontiguousarray(kernel_contour, np.uint8)
    h, w = score.shape
    emb_dim = embedding.shape[-1]
    lib = get_lib()
    if lib is not None:
        lib.pixel_group(
            score.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            embedding.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            emb_dim, contour.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, int(kernel_region_num), float(distance_threshold),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    else:
        # numpy fallback: one-step-at-a-time BFS via label propagation with
        # the embedding-distance gate
        means = np.zeros((kernel_region_num + 1, emb_dim), np.float64)
        for r in range(1, kernel_region_num + 1):
            sel = labels == r
            if sel.any():
                means[r] = embedding[sel].mean(axis=0)
        thr2 = distance_threshold ** 2
        while True:
            changed = False
            for shift, axis in (((1,), 0), ((-1,), 0), ((1,), 1), ((-1,), 1)):
                rolled = np.roll(labels, shift, axis=axis)
                if axis == 0:
                    rolled[0 if shift[0] == 1 else -1, :] = 0
                else:
                    rolled[:, 0 if shift[0] == 1 else -1] = 0
                cand = (labels == 0) & (mask > 0) & (rolled > 0)
                if not cand.any():
                    continue
                d2 = ((embedding - means[rolled]) ** 2).sum(-1)
                take = cand & (d2 <= thr2)
                if take.any():
                    labels[take] = rolled[take]
                    changed = True
            if not changed:
                break
    out = []
    for r in range(1, kernel_region_num + 1):
        ys, xs = np.nonzero(labels == r)
        if len(ys) == 0:
            out.append([0.0, 0.0])
            continue
        avg = float(score[ys, xs].mean())
        pts = np.stack([xs, ys], axis=1).reshape(-1).astype(np.float32)
        out.append([avg, float(len(ys))] + pts.tolist())
    return out
