"""Worker for the two-process jax.distributed smoke test
(tests/test_distributed.py). Replaces the reference's NCCL launcher story
(dist_train.sh -> torch.distributed) with the SPMD equivalent: every
process runs the same program over a global mesh; gradient psums ride the
collective layer jax.distributed provisioned.

Usage: python tests/distributed_worker.py PID NPROCS PORT
"""
import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=2').strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                           num_processes=nprocs, process_id=pid)

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from tps_pp_tpu.apis.flagship import nrtr_tps_pp_cfg, TINY_INPUT  # noqa: E402
from tps_pp_tpu.apis.recognizer import build_recognizer  # noqa: E402
from tps_pp_tpu.parallel import (TrainState, build_optimizer,  # noqa: E402
                                 create_mesh, make_train_step, shard_state)

assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 2 * nprocs, jax.devices()
assert len(jax.local_devices()) == 2

mesh = create_mesh()                        # data axis across both processes
rec = build_recognizer(nrtr_tps_pp_cfg(tiny=True))
h, w, c = TINY_INPUT
batch = 2 * mesh.shape['data']

# identical seeds on every process = the reference's broadcast-from-rank-0
variables = rec.init_variables(jax.random.PRNGKey(0), (batch, h, w, c))
tx, _ = build_optimizer(dict(type='Adam', lr=1e-3))
state = TrainState.create(variables, tx)
rng = np.random.default_rng(0)              # same data on every process
td = rec.label_convertor.str2tensor(['ab'] * batch)
host_batch = {
    'img': rng.standard_normal((batch, h, w, c)).astype(np.float32),
    'valid_ratio': np.ones((batch,), np.float32),
    'padded_targets': np.asarray(td['padded_targets']),
}
def _local(x):
    """Host copy of this process's shard (params/metrics are replicated on
    the model=1 mesh, so the local shard IS the full value)."""
    return np.asarray(x.addressable_data(0))


with mesh:
    state = shard_state(state, mesh)
    train_step = make_train_step(rec, mesh=mesh)
    state, metrics = train_step(state, host_batch, jax.random.PRNGKey(1))
    loss = float(_local(metrics['loss']))

    # params identical across processes after the psum'd step: gather each
    # process's host-side copy of a leaf and compare
    leaf = _local(jax.tree.leaves(state.params)[0])
    gathered = multihost_utils.process_allgather(leaf)   # (nprocs, ...)
    assert gathered.shape[0] == nprocs
    for i in range(1, nprocs):
        np.testing.assert_array_equal(gathered[0], gathered[i])
    checksum = float(sum(np.abs(_local(x).astype(np.float64)).sum()
                         for x in jax.tree.leaves(state.params)))

    # eval-metric gather (the reference's collect_results/all_gather):
    # each process contributes a local count, everyone sees the global sum
    local_metric = np.asarray([100.0 + pid], np.float32)
    all_metrics = multihost_utils.process_allgather(local_metric)
    global_sum = float(all_metrics.sum())
    expected = sum(100.0 + i for i in range(nprocs))
    assert abs(global_sum - expected) < 1e-6, (global_sum, expected)

print(f'WORKER_OK pid={pid} loss={loss:.6f} checksum={checksum:.6f} '
      f'eval={global_sum:.1f}', flush=True)
