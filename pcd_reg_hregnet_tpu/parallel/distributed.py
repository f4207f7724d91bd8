"""Multi-host (multi-process) initialisation and hybrid ICI x DCN meshes.

The reference is single-GPU (SURVEY.md §2.4: no DDP/NCCL/MPI anywhere);
this module is the from-scratch multi-host layer for TPU pods/slices:

* `initialize()` — env-driven `jax.distributed.initialize` so the same
  entry point works single-process (no-op) and under any multi-host
  launcher (TPU pod metadata autodetect, or explicit
  COORDINATOR_ADDRESS / PROCESS_COUNT / PROCESS_INDEX env vars);
* `make_hybrid_mesh()` — a ('dcn', 'ici') mesh: the inner axis spans the
  fast intra-slice interconnect, the outer axis spans slices/hosts over
  the data-center network.  Data parallelism shards batches over BOTH
  axes (gradient psum rides ICI first, then one DCN hop — the standard
  hierarchical-collective layout from the scaling playbook);
* `data_sharding()/replicated_sharding()` — NamedShardings for the train
  step over that mesh.

Run a multi-host job as one process per host:

    COORDINATOR_ADDRESS=host0:1234 PROCESS_COUNT=4 PROCESS_INDEX=$i \
        python -m pcd_reg_hregnet_tpu train --experiment reg_v11 ...

(on Cloud TPU pods the env vars are unnecessary — `initialize()` with no
arguments autodetects everything from the TPU metadata server).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Idempotent `jax.distributed.initialize`.

    Resolution order: explicit args > COORDINATOR_ADDRESS /
    PROCESS_COUNT / PROCESS_INDEX env vars > TPU-pod autodetection when
    launched by a pod runtime.  Returns True when a multi-process runtime
    was (or already had been) initialised, False for plain single-process
    runs — callers never need to branch on environment themselves.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get('COORDINATOR_ADDRESS')
    num_processes = num_processes if num_processes is not None else \
        int(os.environ.get('PROCESS_COUNT', '0')) or None
    process_id = process_id if process_id is not None else \
        (int(os.environ['PROCESS_INDEX'])
         if 'PROCESS_INDEX' in os.environ else None)

    if coordinator is None and num_processes is None:
        # No explicit multi-process config.  On TPU-pod runtimes
        # jax.distributed.initialize() autodetects; elsewhere it would
        # hang waiting for a coordinator, so stay single-process.  A
        # single-entry TPU_WORKER_HOSTNAMES (e.g. 'localhost', set by
        # single-host tunnel runtimes) is NOT a pod — skip autodetect.
        hostnames = os.environ.get('TPU_WORKER_HOSTNAMES', '')
        if ',' in hostnames or \
                os.environ.get('MEGASCALE_COORDINATOR_ADDRESS'):
            try:
                jax.distributed.initialize()
            except RuntimeError as e:
                # Only the backend-already-live cases may fall through to
                # single-process (the XLA backend was brought up — by the
                # host runtime or an earlier JAX call — before we got
                # here, so multi-process setup is no longer possible).
                # Any other failure on a real pod (e.g. coordinator
                # unreachable) must NOT silently degrade into N
                # independent duplicate jobs — re-raise it (ADVICE r2).
                msg = str(e).lower()
                if ('already initialized' not in msg
                        and 'must be called before' not in msg):
                    raise
                if 'must be called before' in msg \
                        and jax.process_count() == 1:
                    # The backend came up before us (some earlier JAX call
                    # during program setup) on what looks like a pod —
                    # this process will now run SINGLE-process.  Loud, so
                    # an accidental N-duplicate-jobs launch is visible in
                    # every worker's log (ADVICE r3 high).
                    import sys
                    print('[distributed] WARNING: pod environment detected '
                          '(TPU_WORKER_HOSTNAMES/MEGASCALE set) but the XLA '
                          'backend was initialised before '
                          'jax.distributed.initialize() could run — '
                          'falling back to SINGLE-process mode. If this is '
                          'a multi-host launch, every worker is now a '
                          'duplicate job. Ensure distributed.initialize() '
                          'runs before any JAX computation.',
                          file=sys.stderr, flush=True)
                _initialized = True
                return jax.process_count() > 1
            _initialized = True
            return jax.process_count() > 1
        return False

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def make_hybrid_mesh(ici_parallel: int = -1, dcn_parallel: int = -1,
                     devices=None) -> Mesh:
    """2-D ('dcn', 'ici') mesh over the global device set.

    `ici_parallel` defaults to local_device_count (devices per host/slice,
    connected by ICI), `dcn_parallel` to process_count (hosts, connected
    by DCN).  Devices are ordered so each mesh row ('ici' axis) stays
    within one process — collectives along 'ici' never cross DCN.  Works
    on the fake multi-device CPU backend too (everything lands in one
    'dcn' group per the single process).
    """
    devices = list(devices if devices is not None else jax.devices())
    if ici_parallel in (-1, 0):
        ici_parallel = max(1, len(devices) // max(1, jax.process_count()))
    if dcn_parallel in (-1, 0):
        dcn_parallel = len(devices) // ici_parallel
    if dcn_parallel * ici_parallel != len(devices):
        raise ValueError(f'dcn({dcn_parallel}) x ici({ici_parallel}) != '
                         f'{len(devices)} devices')
    # group rows by owning process so the inner axis is really ICI-local
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    grid = np.asarray(devices).reshape(dcn_parallel, ici_parallel)
    return Mesh(grid, ('dcn', 'ici'))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over BOTH mesh axes (pure data parallelism)."""
    return NamedSharding(mesh, P(('dcn', 'ici')))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_local_batch_slice(global_batch: int) -> slice:
    """Which rows of the global batch this process should load.

    Multi-host input pipeline contract: every process loads only its
    local shard (global_batch / process_count consecutive items) and
    `jax.make_array_from_process_local_data` assembles the global array.
    """
    per = global_batch // jax.process_count()
    lo = per * jax.process_index()
    return slice(lo, lo + per)


def shard_global_batch(batch, mesh: Mesh):
    """Assemble a global sharded batch from per-process local arrays.

    Single-process: equivalent to a plain device_put with the data
    sharding.  Multi-process: each host passes its local slice and JAX
    stitches the global logical array without any cross-host copy.
    """
    sharding = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
