"""File/env utilities (reference ``mmocr/utils/fileio.py`` list_from_file /
list_to_file and ``mmocr/utils/collect_env.py``)."""
from __future__ import annotations

import os
import platform
import sys
from typing import Iterable, List


def list_from_file(filename: str, encoding: str = 'utf-8') -> List[str]:
    with open(filename, encoding=encoding) as f:
        return [line.rstrip('\r\n') for line in f]


def list_to_file(filename: str, lines: Iterable[str],
                 encoding: str = 'utf-8'):
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, 'w', encoding=encoding) as f:
        for line in lines:
            f.write(f'{line}\n')


def collect_env() -> dict:
    """Environment report (reference collect_env; jax flavored)."""
    info = {
        'sys.platform': sys.platform,
        'python': sys.version.replace('\n', ''),
        'machine': platform.machine(),
    }
    try:
        import jax
        info['jax'] = jax.__version__
        info['jax.devices'] = str(jax.devices())
        info['default_backend'] = jax.default_backend()
    except Exception as e:  # pragma: no cover
        info['jax'] = f'unavailable ({e})'
    for mod in ('flax', 'optax', 'numpy', 'cv2'):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, '__version__', 'unknown')
        except ImportError:
            info[mod] = 'missing'
    try:
        from ..native import get_lib
        info['tps_native'] = 'built' if get_lib() is not None else 'missing'
    except Exception:
        info['tps_native'] = 'error'
    return info
