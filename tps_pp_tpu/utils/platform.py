"""JAX platform selection for CLI entry points.

The axon TPU plugin registers itself unconditionally and overrides the
standard ``JAX_PLATFORMS``/``JAX_PLATFORM_NAME`` env vars — only
``jax.config.update('jax_platforms', ...)`` reliably selects a backend
once the plugin is on the path. That breaks the usual contract where
``JAX_PLATFORMS=cpu python tools/train.py ...`` forces CPU (e.g. for the
test suite, or running the CLI on a host whose TPU tunnel is down).

Entry-point scripts call :func:`apply_jax_platform_env` before first
device use to restore the standard env-var semantics.
"""
import os


def apply_jax_platform_env():
    """Re-apply ``JAX_PLATFORMS`` via the config API (see module doc)."""
    plat = os.environ.get('JAX_PLATFORMS') or os.environ.get(
        'JAX_PLATFORM_NAME')
    if plat:
        import jax
        jax.config.update('jax_platforms', plat)
