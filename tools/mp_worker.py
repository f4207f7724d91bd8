"""Multi-process worker: one simulated 'host' of a 2-host training job.

Used by tests/test_multiprocess.py (and manually) to exercise the REAL
multi-host code path — `parallel.distributed.initialize` from env vars,
hybrid ('dcn', 'ici') mesh over the global device set, per-process batch
slicing, `make_array_from_process_local_data`, and a data-parallel train
step whose gradient psum crosses the process boundary:

    COORDINATOR_ADDRESS=localhost:<port> PROCESS_COUNT=2 PROCESS_INDEX=$i \
        JAX_PLATFORMS=cpu python tools/mp_worker.py

Prints one final line `MP_RESULT <process_index> <loss0> <loss2>`.
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=2')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
try:  # CPU cross-process collectives ride gloo
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
except Exception:
    pass


def main() -> int:
    import dataclasses
    import numpy as np

    from pcd_reg_hregnet_tpu.core.config import LevelConfig
    from pcd_reg_hregnet_tpu.data import batch_iterator, load_dataset
    from pcd_reg_hregnet_tpu.parallel import distributed
    from pcd_reg_hregnet_tpu.parallel.mesh import shard_batch
    from pcd_reg_hregnet_tpu.train import experiment
    from pcd_reg_hregnet_tpu.train.loop import create_state, make_train_step
    from pcd_reg_hregnet_tpu.train.objective import RegistrationObjective

    assert distributed.initialize(), 'expected a multi-process env'
    assert jax.process_count() > 1

    mesh = distributed.make_hybrid_mesh()   # dcn = processes, ici = local
    cfg = experiment('reg_v0')
    bs = mesh.size * 1
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            levels=(LevelConfig(32, 8, (8, 8, 16), 16),
                    LevelConfig(16, 4, (16, 16, 32), 32),
                    LevelConfig(8, 4, (32, 32, 64), 64)),
            coarse_k=4, fine_k=4),
        data=dataclasses.replace(cfg.data, dataset='synthetic',
                                 pcd_min_samples=64, batch_size=bs),
        train=dataclasses.replace(cfg.train, lr=1e-3, schedule='constant'))

    ds = load_dataset(cfg.data, 'train', length=bs, points_per_cloud=128)

    class CountingDataset:
        """Proxy asserting the per-process input contract: each process
        loads exactly global_batch / process_count items (VERDICT r2 #6)."""

        def __init__(self, inner):
            self.inner, self.loads = inner, 0

        def __len__(self):
            return len(self.inner)

        def __getitem__(self, i):
            self.loads += 1
            return self.inner[i]

    counted = CountingDataset(ds)
    sl = distributed.process_local_batch_slice(bs)
    local = next(batch_iterator(counted, bs, local_slice=sl))
    expect = bs // jax.process_count()
    assert counted.loads == expect, (counted.loads, expect)
    assert local['pcd_left'].shape[0] == expect

    objective = RegistrationObjective(cfg)
    state, tx = create_state(cfg, objective, local, 1)
    step = make_train_step(objective, tx, mesh)
    sb = shard_batch(local, mesh)

    losses = []
    for _ in range(3):
        state, metrics = step(state, sb)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(l) for l in losses), losses
    print(f'MP_RESULT {jax.process_index()} {losses[0]:.6f} {losses[2]:.6f}',
          flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
