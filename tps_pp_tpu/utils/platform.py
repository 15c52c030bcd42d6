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


def maybe_init_distributed():
    """Multi-host ``jax.distributed`` init for CLI entry points.

    The jax-native analog of the reference's ``init_dist(launcher)``
    (mmcv, launchers pytorch/slurm — tools/train.py:125-132), covering the
    two documented launch paths:

    * explicit env (tools/dist_train.sh): ``JAX_COORDINATOR_ADDRESS`` plus
      ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` exported to every host. jax
      itself reads only the address from env (jax/_src/distributed.py
      resolves ``JAX_COORDINATOR_ADDRESS`` but raises on undefined process
      counts), so the counts are forwarded explicitly here.
    * Slurm (tools/slurm_train.sh): >1 task — bare ``initialize()`` lets
      jax's cluster detection derive everything from the SLURM_* env vars.

    Single-process runs (neither signal present) skip initialization.
    """
    if os.environ.get('JAX_COORDINATOR_ADDRESS'):
        import jax
        num = os.environ.get('JAX_NUM_PROCESSES')
        pid = os.environ.get('JAX_PROCESS_ID')
        jax.distributed.initialize(
            num_processes=int(num) if num else None,
            process_id=int(pid) if pid else None)
    elif int(os.environ.get('SLURM_NTASKS', '1') or '1') > 1:
        import jax
        jax.distributed.initialize()


def training_rng(seed: int, impl: str = 'auto'):
    """Dropout/rng base key for the train loops.

    impl 'auto' picks the TPU hardware RNG ('rbg', XLA RngBitGenerator)
    on TPU backends and threefry elsewhere: threefry mask generation is
    pure VPU arithmetic and MEASURED 21.4 ms/step of the flagship's
    276.9 ms B=512 train step (scratch/profile_train.py full-vs-rbg,
    ROADMAP r5 training ledger) — ~8% throughput for free. 'rbg' is
    deterministic per (key, program) on a fixed backend; pass
    impl='threefry' for bit-exact cross-version mask reproducibility
    (the torch reference guarantees neither — cuDNN dropout).
    """
    import jax
    if impl == 'auto':
        impl = 'rbg' if jax.default_backend() == 'tpu' else 'threefry2x32'
    elif impl == 'threefry':
        impl = 'threefry2x32'
    return jax.random.key(seed, impl=impl)
