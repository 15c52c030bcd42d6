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


def test_two_process_cli_eval(tmp_path):
    """tools/test.py driven two-process through the documented env launch
    (JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES/JAX_PROCESS_ID, the
    dist_test.sh contract): per-rank dataset shards, ICI result gather,
    rank-0-only --out write, and metrics identical to a single-process run
    (reference: multi_gpu_test + collect_results_gpu, tools/test.py:206-217).
    """
    import json

    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = 'configs/textrecog/crnn/crnn_toy_dataset.py'
    tmp = str(tmp_path)
    outs = [os.path.join(tmp, f'rank{r}.json') for r in range(2)]

    def run(extra_env, out_path):
        env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
        env.update(JAX_PLATFORMS='cpu', **extra_env)
        return subprocess.Popen(
            [sys.executable, 'tools/test.py', cfg, '--eval', 'acc',
             '--out', out_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo)

    procs = [run({'JAX_COORDINATOR_ADDRESS': f'127.0.0.1:{port}',
                  'JAX_NUM_PROCESSES': '2', 'JAX_PROCESS_ID': str(r)},
                 outs[r]) for r in range(2)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for r, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f'rank {r} failed:\n{log[-4000:]}'
    assert os.path.exists(outs[0]), logs[0][-2000:]   # rank 0 writes
    assert not os.path.exists(outs[1])                # rank 1 is gated off

    # single-process reference run: identical metrics (same PRNG init)
    single = os.path.join(tmp, 'single.json')
    p = run({}, single)
    log, _ = p.communicate(timeout=480)
    assert p.returncode == 0, log[-4000:]
    with open(outs[0]) as f:
        dist_metrics = json.load(f)['metrics']
    with open(single) as f:
        single_metrics = json.load(f)['metrics']
    assert dist_metrics == single_metrics, (dist_metrics, single_metrics)


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
