"""Profiling / observability (reference §5.1: a wall-clock ms/image print in
single_gpu_test and a cProfile harness — this is the strict upgrade the
SURVEY calls for: jax profiler traces + throughput counters).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """images/sec/chip counter (the BASELINE metric)."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = n_chips
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._images = 0

    def update(self, n_images: int):
        self._images += n_images

    @property
    def images_per_sec_per_chip(self) -> float:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self._images / dt / self.n_chips

    def __repr__(self):
        return f'{self.images_per_sec_per_chip:.1f} img/s/chip'


@contextlib.contextmanager
def timed(name: str, sink: Optional[dict] = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
