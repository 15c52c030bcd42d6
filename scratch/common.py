"""Shared helpers for the scratch evidence scripts.

These scripts back the perf/accuracy claims in ROADMAP.md: a synthetic
rendered-text dataset (zero egress / no data mounts, so memorization on
rendered text is the honest stand-in for real-data training), fp32->bf16
flagship training, checkpoint save/load, and an axon-tunnel-robust timing
harness (same inner-scan trick as bench.py — per-dispatch tunnel latency
must not be billed to the chip).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache')

CKPT_DEFAULT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'flagship_toy.msgpack')

from tps_pp_tpu.utils.synth_text import render_dataset  # noqa: F401
# (the renderer moved into the package so the heavy decode-mode parity
# test and these evidence scripts share one implementation)


def enable_compile_cache():
    import jax
    # this jax build ignores JAX_COMPILATION_CACHE_DIR (like JAX_PLATFORMS);
    # only the config API works (see bench.py)
    jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)


def save_params(path: str, variables) -> None:
    from flax import serialization
    with open(path, 'wb') as f:
        f.write(serialization.to_bytes(variables))


def load_params(path: str, template):
    from flax import serialization
    with open(path, 'rb') as f:
        return serialization.from_bytes(template, f.read())


def timed_scan(fn, args, inner: int = 6, iters: int = 3, warmup: int = 2):
    """Wall-time `fn(*args)` batches inside one jitted scan (bench.py's
    measurement: block_until_ready is unreliable over the axon tunnel and
    ~30ms/dispatch tunnel latency must not be billed to the chip). `fn`
    must return an array; each inner batch depends on the previous scalar
    so nothing is elided. Returns seconds per single `fn` call."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_many(*a):
        def body(acc, _):
            perturbed = tuple(
                x + (acc * 1e-30).astype(x.dtype)
                if isinstance(x, jax.Array) and jnp.issubdtype(
                    x.dtype, jnp.floating) else x
                for x in a)
            s = fn(*perturbed).astype(jnp.float32).sum()
            return s, ()
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=inner)
        return acc

    def run():
        return float(np.asarray(run_many(*args)))

    for _ in range(warmup):
        assert np.isfinite(run())
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = time.perf_counter() - t0
    return dt / (iters * inner)


def build_model_cfg(model: str, dtype: str = 'bfloat16',
                    kv_dtype: str = 'bfloat16', decode_mode: str = 'steps'):
    """(cfg, (h, w, c), default_ckpt_path) for the evidence scripts'
    --model switch: 'nrtr' = the flagship, 'satrn' = SATRN-small from the
    shipped config (decode-mode A/B for the second fused-capable family)."""
    import os as _os
    here = _os.path.dirname(_os.path.abspath(__file__))
    if model == 'nrtr':
        from tps_pp_tpu.apis.flagship import FLAGSHIP_INPUT, nrtr_tps_pp_cfg
        cfg = nrtr_tps_pp_cfg(dtype=dtype, kv_dtype=kv_dtype,
                              decode_mode=decode_mode)
        return cfg, FLAGSHIP_INPUT, CKPT_DEFAULT
    if model == 'satrn':
        from tps_pp_tpu.config import load_config
        lc = load_config(_os.path.join(here, '..', 'configs', 'textrecog',
                                       'satrn', 'satrn_small.py'))
        cfg = dict(lc['model'])
        cfg['dtype'] = dtype
        cfg['decode_mode'] = decode_mode
        cfg['decoder'] = dict(cfg['decoder'], kv_dtype=kv_dtype)
        return cfg, tuple(lc['input_shape']), _os.path.join(
            here, 'satrn_toy.msgpack')
    raise ValueError(f'unknown --model {model}')
