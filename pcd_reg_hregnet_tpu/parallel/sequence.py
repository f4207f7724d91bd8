"""Sequence parallelism over the serialized point order (SURVEY.md §5.7).

For very large clouds the PTv3 encoder's memory/time is linear in N; this
module shards the *serialized order* (the N axis after the space-filling-
curve sort) across the mesh.  The key structural fact making this cheap:

* Patch attention is local to contiguous K-point patches of the
  serialized order.  With the shard size a multiple of K (enforced), every
  patch lives wholly on one device — attention needs ZERO communication.
  (The reference's analog — flash-attn over varlen patches,
  `/root/reference/models/model_v6/ptv3.py:476-482` — has no distribution
  story at all; this is a from-scratch design.)
* The CPE (serialized depthwise conv, kernel w) mixes each point with its
  w//2 predecessors/successors on the curve — the ONLY cross-shard
  dataflow.  It needs a halo exchange of w//2 boundary points between
  curve-adjacent devices.

Two interchangeable implementations (tested equal):

1. `gspmd_sequence_apply` — jit the unmodified flax module with the N axis
   sharded; XLA's SPMD partitioner keeps attention local and inserts the
   collective-permute halo for the conv automatically.  The production
   path: zero code changes to the model.
2. `halo_exchange` — the explicit `shard_map` building block (ppermute of
   boundary rows) for kernels XLA cannot partition automatically (e.g.
   custom Pallas calls).
"""
from __future__ import annotations

import contextlib
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sequence_sharding(mesh: Mesh, axis: str = 'seq') -> NamedSharding:
    """[B, N, C] arrays sharded on the serialized (N) axis."""
    return NamedSharding(mesh, P(None, axis, None))


# --- user-facing wiring (VERDICT r4 #10) --------------------------------
# `evaluate(..., seq_parallel=N)` / `--seq-parallel N` route the PTv3
# encoder through GSPMD sequence sharding *inside* the production forward:
# the encoder (models/ptv3.py) places with_sharding_constraint on its
# serialized activations when ModelConfig.seq_axis is set, binding to the
# mesh made active here.  The constraints bind at TRACE time — enter this
# context before the first jitted call.
_ACTIVE_SEQ_MESH: list = []


@contextlib.contextmanager
def sequence_mesh(mesh: Mesh):
    """Make `mesh` the binding target for model-internal sequence-sharding
    constraints (`ModelConfig.seq_axis`) for the duration of the block."""
    _ACTIVE_SEQ_MESH.append(mesh)
    try:
        yield mesh
    finally:
        _ACTIVE_SEQ_MESH.pop()


def active_sequence_mesh() -> Optional[Mesh]:
    return _ACTIVE_SEQ_MESH[-1] if _ACTIVE_SEQ_MESH else None


def seq_constrain(x: jnp.ndarray, axis: Optional[str]) -> jnp.ndarray:
    """Constrain dim 1 (the serialized N axis) of `x` to shard over the
    active sequence mesh; identity when no axis/mesh is configured."""
    mesh = active_sequence_mesh()
    if axis is None or mesh is None:
        return x
    spec = P(None, axis, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def check_patch_alignment(n_points: int, patch_size: int, n_shards: int) -> None:
    """Shard size must be a multiple of the attention patch size — the
    invariant that makes sequence-sharded patch attention communication-
    free."""
    if n_points % n_shards:
        raise ValueError(f'N={n_points} must divide over {n_shards} shards')
    shard = n_points // n_shards
    if shard % patch_size:
        raise ValueError(
            f'shard size {shard} must be a multiple of patch_size '
            f'{patch_size} so no attention patch straddles a device')


def gspmd_sequence_apply(module, variables, x: jnp.ndarray, mesh: Mesh,
                         axis: str = 'seq', patch_size: Optional[int] = None):
    """Apply a flax module with the sequence axis sharded over `mesh`.

    Parameters replicate; activations shard on N.  XLA partitions patch
    attention locally (reshape [B, N/K, K, C] splits the patch axis) and
    inserts halo collectives for serialized convs.
    """
    if patch_size is not None:
        check_patch_alignment(x.shape[1], patch_size, mesh.devices.size)
    seq_sh = sequence_sharding(mesh, axis)
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, in_shardings=(rep, seq_sh), out_shardings=seq_sh)
    def run(v, xx):
        return module.apply(v, xx)

    return run(variables, x)


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str = 'seq') -> jnp.ndarray:
    """Explicit boundary exchange inside `shard_map`: prepend the previous
    shard's last `halo` rows and append the next shard's first `halo` rows
    (zero-padded at the curve ends).

    x: [B, n_local, C] (the device-local block) -> [B, n_local + 2*halo, C].
    """
    n_dev = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]   # send tail ->
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]   # send head <-
    tail = jax.lax.ppermute(x[:, -halo:], axis_name, fwd)  # prev's tail
    head = jax.lax.ppermute(x[:, :halo], axis_name, bwd)   # next's head
    # curve endpoints see zeros, matching 'SAME' conv padding
    tail = jnp.where(idx == 0, jnp.zeros_like(tail), tail)
    head = jnp.where(idx == n_dev - 1, jnp.zeros_like(head), head)
    return jnp.concatenate([tail, x, head], axis=1)


def shardmap_depthwise_conv(x: jnp.ndarray, kernel: jnp.ndarray, mesh: Mesh,
                            axis: str = 'seq') -> jnp.ndarray:
    """Explicit sequence-sharded serialized depthwise conv ('SAME').

    x: [B, N, C] global; kernel: [w, 1, C] (flax Conv depthwise layout).
    Reference point for testing the GSPMD path and the template for
    sharding custom kernels.
    """
    w = kernel.shape[0]
    halo = w // 2

    def local(xl, k):
        xh = halo_exchange(xl, halo, axis)
        out = jax.lax.conv_general_dilated(
            xh, k, window_strides=(1,), padding='VALID',
            dimension_numbers=('NHC', 'HIO', 'NHC'),
            feature_group_count=xl.shape[-1])
        return out

    from jax import shard_map
    sharded = jax.jit(shard_map(local, mesh=mesh,
                                in_specs=(P(None, axis, None), P()),
                                out_specs=P(None, axis, None)))
    return sharded(x, kernel)
