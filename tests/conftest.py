"""Test harness config: force CPU with 8 virtual devices so sharding/psum
paths are exercised without a TPU (SURVEY §4 'implication for the rebuild').

Must run before jax is imported anywhere — pytest imports conftest first.
"""
import os
import sys

# force CPU (the environment presets JAX_PLATFORMS=axon, so a setdefault
# would silently leave the suite on the TPU tunnel)
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache')
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# default matmul precision truncates to bf16 (the right call on the MXU,
# wrong for parity assertions) — tests run at full fp32. The env var is not
# honored by this jax build, so set the config directly.
import jax  # noqa: E402

# the axon plugin overrides JAX_PLATFORMS/JAX_PLATFORM_NAME env vars; only
# the config API reliably selects the CPU backend here
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
# this jax build ignores JAX_COMPILATION_CACHE_DIR (like JAX_PLATFORMS);
# the config API is the only way to enable the persistent compile cache,
# which makes repeat suite runs warm.
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
assert len(jax.devices()) == 8, (
    f'expected 8 virtual CPU devices, got {jax.devices()}')
