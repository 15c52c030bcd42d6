"""Two-process jax.distributed smoke (SURVEY §5.8): the multi-host entry
(tools/train.py JAX_COORDINATOR_ADDRESS path) actually executed — two CPU
processes, one coordinator, a global 4-device mesh, one psum'd train step
with identical resulting params, and a process_allgather'd eval metric
(the reference gets this story from its NCCL launchers + collect_results).
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.heavy, pytest.mark.slow]


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          'distributed_worker.py')
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS',)}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), '2', str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(worker)))
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{out[-4000:]}'
    ok = [line for out in outs for line in out.splitlines()
          if line.startswith('WORKER_OK')]
    assert len(ok) == 2, outs
    # both processes converged to the SAME params and global eval sum
    sig0 = ok[0].split('pid=')[1].split(' ', 1)[1]
    sig1 = ok[1].split('pid=')[1].split(' ', 1)[1]
    assert sig0 == sig1, (sig0, sig1)
