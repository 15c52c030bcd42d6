"""First-party native runtime: levenshtein, packed dataset, CTC collapse."""
import os

import numpy as np
import pytest

from tps_pp_tpu import native
from tps_pp_tpu.evaluation.ocr_metric import _levenshtein_py


def test_native_lib_builds():
    assert native.get_lib() is not None, 'g++ build of tps_native failed'


@pytest.mark.parametrize('a,b', [
    ('', ''), ('abc', ''), ('', 'xy'), ('kitten', 'sitting'),
    ('hello', 'hello'), ('中文字', '中文'), ('abcdef', 'azced'),
])
def test_levenshtein_matches_python(a, b):
    assert native.levenshtein(a, b) == _levenshtein_py(a, b)


def test_packed_roundtrip(tmp_path):
    path = str(tmp_path / 'data.pack')
    records = [b'img_0.jpg hello', b'img_1.jpg world', b'', b'x' * 10000]
    native.write_packed(path, records)
    reader = native.PackedReader(path)
    assert len(reader) == 4
    for i, r in enumerate(records):
        assert reader[i] == r
    with pytest.raises(IndexError):
        reader[4]
    # picklable across workers
    import pickle
    r2 = pickle.loads(pickle.dumps(reader))
    assert r2[1] == records[1]


def test_packed_rejects_corrupt_header(tmp_path):
    """A truncated/corrupt TPSPACK1 file must fail cleanly at open — the
    header count is validated against the mapped size before the offset
    table is trusted (no SIGBUS on reads past the mmap)."""
    import struct
    lib = native.get_lib()
    if lib is None:
        pytest.skip('native lib unavailable')
    # absurd count field: 16 + 8*(count+1) overflows the file size
    bad = tmp_path / 'bad.pack'
    bad.write_bytes(b'TPSPACK1' + struct.pack('<Q', 10 ** 12))
    assert not lib.packed_open(str(bad).encode())
    # trailing offset pointing past EOF
    bad2 = tmp_path / 'bad2.pack'
    bad2.write_bytes(b'TPSPACK1' + struct.pack('<Q', 1) +
                     struct.pack('<QQ', 32, 10 ** 9))
    assert not lib.packed_open(str(bad2).encode())
    # control: a well-formed single-record file still opens
    good = tmp_path / 'good.pack'
    native.write_packed(str(good), [b'rec'])
    h = lib.packed_open(str(good).encode())
    assert h and lib.packed_count(h) == 1
    lib.packed_close(h)


def test_packed_loader(tmp_path):
    from tps_pp_tpu.datasets.loader import PackedLoader
    path = str(tmp_path / 'ann.pack')
    native.write_packed(path, [b'a.jpg foo', b'b.jpg bar'])
    loader = PackedLoader(path, dict(type='LineStrParser',
                                     keys=['filename', 'text'],
                                     keys_idx=[0, 1]))
    assert len(loader) == 2
    assert loader[1] == {'filename': 'b.jpg', 'text': 'bar'}


def test_ctc_collapse():
    pred = np.array([0, 3, 3, 0, 4, 4, 4, 0, 0, 3], np.int32)
    assert native.ctc_collapse(pred, blank=0) == [3, 4, 3]
