"""TRUE multi-process integration test (VERDICT r1 next-step #3).

Launches two OS processes that form a real `jax.distributed` cluster over
localhost (gloo CPU collectives), each simulating one host with 2 local
devices, and runs data-parallel training steps over the hybrid
('dcn', 'ici') mesh: `distributed.initialize` from env vars, per-process
batch slicing, `make_array_from_process_local_data`, cross-process
gradient psum.  Both processes must report identical, finite, decreasing
losses.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tools', 'mp_worker.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


@pytest.mark.timeout(600)
def test_two_process_training_agrees():
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    env_base.update(
        COORDINATOR_ADDRESS=f'localhost:{port}', PROCESS_COUNT='2',
        JAX_PLATFORMS='cpu',
        XLA_FLAGS='--xla_force_host_platform_device_count=2',
        PALLAS_AXON_POOL_IPS='')
    procs = []
    for i in range(2):
        env = dict(env_base, PROCESS_INDEX=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
        assert p.returncode == 0, f'worker failed:\n{out[-3000:]}'
    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith('MP_RESULT')][-1]
        _, pid, l0, l2 = line.split()
        results[int(pid)] = (float(l0), float(l2))
    assert set(results) == {0, 1}
    # replicated state + psum'd grads => both processes see the same loss
    assert results[0] == results[1]
    l0, l2 = results[0]
    assert l2 < l0, 'loss must decrease over 3 steps'
