"""Sequence-level pose-graph optimisation (Gauss-Newton on SE(3)).

This layer has **no reference counterpart** (the reference registers
isolated frame pairs — SURVEY.md §2.4); it comes from this framework's
north-star spec: keyframe streams registered pairwise by the network feed
a pose graph whose joint optimisation runs on-device, and at scale the
constraint set is sharded across the device mesh with `psum` reduction of
the normal equations.

Formulation (standard right-perturbation pose-graph GN):
  variables   X_k in SE(3), k = 0..K-1 (keyframe poses, world frame)
  constraints (i, j, Z_ij, w_ij): measured relative pose Z_ij ~ X_i^{-1} X_j
  residual    r = log(Z^{-1} X_i^{-1} X_j)                [6]
  Jacobians   J_j =  Jr^{-1}(r),  J_i = -Jr^{-1}(r) Ad(X_j^{-1} X_i)
              with Jr^{-1}(r) ~ I + ad(r)/2 (2nd-order right-Jacobian inverse)
  update      X_k <- X_k exp(dx_k)

TPU mapping: all M constraints are processed as one batch (vectorised
residual/Jacobian math), the dense normal system H [6K, 6K] is built with
one segment-sum (scatter-add of 6x6 blocks) and solved with a Cholesky
factorisation — dense is the right call on the MXU for K up to ~1k
keyframes.  Gauge freedom is fixed by a strong prior on pose 0.
For multi-device operation see `distributed_solve` (constraint-parallel
with psum'd normal equations under shard_map).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3


class PoseGraph(NamedTuple):
    """Fixed-shape pose-graph problem.

    poses: [K, 4, 4] initial keyframe poses.
    edges_i, edges_j: [M] int32 endpoint indices.
    measurements: [M, 4, 4] relative poses Z_ij ~ X_i^{-1} X_j.
    weights: [M] scalar information weights (0 disables an edge, enabling
        static-shape padding).
    """
    poses: jnp.ndarray
    edges_i: jnp.ndarray
    edges_j: jnp.ndarray
    measurements: jnp.ndarray
    weights: jnp.ndarray


def residuals(poses: jnp.ndarray, graph: PoseGraph) -> jnp.ndarray:
    """Edge residuals r = log(Z^{-1} X_i^{-1} X_j): [M, 6]."""
    Xi = poses[graph.edges_i]
    Xj = poses[graph.edges_j]
    rel = se3.inverse(graph.measurements) @ se3.inverse(Xi) @ Xj
    return se3.log(rel)


def _edge_system(poses: jnp.ndarray, graph: PoseGraph):
    """Per-edge residuals and Jacobian blocks.

    Returns r [M, 6], J_i [M, 6, 6], J_j [M, 6, 6].
    """
    Xi = poses[graph.edges_i]
    Xj = poses[graph.edges_j]
    rel_ij = se3.inverse(Xi) @ Xj
    r = se3.log(se3.inverse(graph.measurements) @ rel_ij)

    eye = jnp.broadcast_to(jnp.eye(6, dtype=r.dtype), (r.shape[0], 6, 6))
    Jr_inv = eye + 0.5 * se3.ad(r)
    J_j = Jr_inv
    J_i = -Jr_inv @ se3.adjoint(se3.inverse(rel_ij))
    return r, J_i, J_j


def _normal_equations(poses, graph):
    """Dense H [K*6, K*6], b [K*6] via block scatter-add."""
    K = poses.shape[0]
    r, J_i, J_j = _edge_system(poses, graph)
    w = graph.weights[:, None, None]

    # per-edge blocks
    H_ii = jnp.swapaxes(J_i, -1, -2) @ J_i * w
    H_jj = jnp.swapaxes(J_j, -1, -2) @ J_j * w
    H_ij = jnp.swapaxes(J_i, -1, -2) @ J_j * w
    b_i = jnp.einsum('mab,mb->ma', jnp.swapaxes(J_i, -1, -2) * w, r)
    b_j = jnp.einsum('mab,mb->ma', jnp.swapaxes(J_j, -1, -2) * w, r)

    H = jnp.zeros((K, K, 6, 6), r.dtype)
    H = H.at[graph.edges_i, graph.edges_i].add(H_ii)
    H = H.at[graph.edges_j, graph.edges_j].add(H_jj)
    H = H.at[graph.edges_i, graph.edges_j].add(H_ij)
    H = H.at[graph.edges_j, graph.edges_i].add(jnp.swapaxes(H_ij, -1, -2))
    b = jnp.zeros((K, 6), r.dtype)
    b = b.at[graph.edges_i].add(b_i)
    b = b.at[graph.edges_j].add(b_j)

    H = jnp.moveaxis(H, 2, 1).reshape(K * 6, K * 6)
    b = b.reshape(K * 6)
    # gauge fix: strong prior on pose 0
    anchor = jnp.zeros(K * 6, r.dtype).at[:6].set(1e6)
    H = H + jnp.diag(anchor)
    return H, b


@partial(jax.jit, static_argnames=('iters',))
def optimize(graph: PoseGraph, iters: int = 10,
             damping: float = 1e-6) -> jnp.ndarray:
    """Gauss-Newton pose-graph solve; returns optimised poses [K, 4, 4]."""
    K = graph.poses.shape[0]

    def step(_, poses):
        H, b = _normal_equations(poses, graph)
        H = H + damping * jnp.eye(K * 6, dtype=H.dtype)
        dx = -jnp.linalg.solve(H, b).reshape(K, 6)
        return poses @ se3.exp(dx)

    return jax.lax.fori_loop(0, iters, step, graph.poses)


def chi2(poses: jnp.ndarray, graph: PoseGraph) -> jnp.ndarray:
    """Weighted squared residual norm (optimisation objective)."""
    r = residuals(poses, graph)
    return jnp.sum(graph.weights * jnp.sum(r * r, axis=-1))


# ---------------------------------------------------------------------------
# distributed (constraint-parallel) solve
# ---------------------------------------------------------------------------

def distributed_optimize(graph: PoseGraph, mesh, iters: int = 10,
                         damping: float = 1e-6,
                         axis_name: str = 'data') -> jnp.ndarray:
    """Pose-graph GN with constraints sharded across the mesh.

    Each device builds the normal-equation contribution of its edge shard;
    `psum` over the mesh reduces (H, b); every device solves the (small,
    replicated) dense system.  M must be a multiple of the mesh size —
    pad with zero-weight edges.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    K = graph.poses.shape[0]

    def step_shard(poses, ei, ej, Z, w):
        local = PoseGraph(poses, ei, ej, Z, w)
        H, b = _normal_equations(poses, local)
        # the anchor prior is added per shard: rescale so the psum'd total
        # matches the single-device system
        n_shards = jax.lax.psum(1, axis_name)
        anchor = jnp.zeros(K * 6, H.dtype).at[:6].set(1e6 * (n_shards - 1) / n_shards)
        H = H - jnp.diag(anchor)
        H = jax.lax.psum(H, axis_name)
        b = jax.lax.psum(b, axis_name)
        H = H + damping * jnp.eye(K * 6, dtype=H.dtype)
        dx = -jnp.linalg.solve(H, b).reshape(K, 6)
        return poses @ se3.exp(dx)

    sharded = jax.jit(shard_map(
        step_shard, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P()))

    poses = graph.poses
    for _ in range(iters):
        poses = sharded(poses, graph.edges_i, graph.edges_j,
                        graph.measurements, graph.weights)
    return poses


# ---------------------------------------------------------------------------
# keyframe-partitioned Schur-complement solve (multi-host BA)
# ---------------------------------------------------------------------------

class PartitionedGraph(NamedTuple):
    """A pose graph partitioned into `P` contiguous keyframe chunks.

    The keyframe stream [K] is split into P chunks of length L = K // P
    (one per device/host).  The first and last pose of every chunk are
    **separators** (2P of them); the rest are **interior**.  Edges whose
    endpoints lie in one chunk are that chunk's local edges; edges crossing
    chunks must connect separator poses only (odometry links between
    neighbouring chunks and loop closures between chunk boundaries satisfy
    this by construction — `partition_graph` validates it).

    local_*: [P, E_max] / [P, E_max, 4, 4] per-chunk edge arrays, indices
        rebased to the chunk (0..L-1), zero-weight padded to E_max.
    cross_*: [E_c] / [E_c, 4, 4] separator-separator edges, indexed into
        the global separator ordering (chunk p contributes separators
        2p = pose p*L and 2p+1 = pose p*L + L - 1).
    """
    poses: jnp.ndarray          # [K, 4, 4]
    local_i: jnp.ndarray        # [P, E_max] chunk-rebased
    local_j: jnp.ndarray
    local_Z: jnp.ndarray        # [P, E_max, 4, 4]
    local_w: jnp.ndarray        # [P, E_max]
    cross_i: jnp.ndarray        # [E_c] separator indices (0..2P-1)
    cross_j: jnp.ndarray
    cross_Z: jnp.ndarray        # [E_c, 4, 4]
    cross_w: jnp.ndarray        # [E_c]


def partition_graph(graph: PoseGraph, num_partitions: int) -> PartitionedGraph:
    """Host-side partitioner: split a PoseGraph into contiguous chunks.

    Raises if K is not divisible by `num_partitions`, chunks are shorter
    than 3 poses, or any cross-chunk edge touches an interior pose (such
    graphs need a different separator set — re-keyframe or lower P).
    """
    import numpy as np

    K = graph.poses.shape[0]
    P_ = num_partitions
    if K % P_:
        raise ValueError(f'K={K} keyframes not divisible by P={P_}')
    L = K // P_
    if L < 3:
        raise ValueError(f'chunk length {L} < 3: no interior poses to eliminate')

    ei = np.asarray(graph.edges_i)
    ej = np.asarray(graph.edges_j)
    Z = np.asarray(graph.measurements)
    w = np.asarray(graph.weights)
    part_i, part_j = ei // L, ej // L

    def sep_id(k):
        p, r = divmod(int(k), L)
        if r == 0:
            return 2 * p
        if r == L - 1:
            return 2 * p + 1
        return None

    local = [[] for _ in range(P_)]
    cross = []
    for m in range(len(ei)):
        if part_i[m] == part_j[m]:
            local[part_i[m]].append(m)
        else:
            si, sj = sep_id(ei[m]), sep_id(ej[m])
            if si is None or sj is None:
                raise ValueError(
                    f'cross-chunk edge ({ei[m]},{ej[m]}) touches an interior '
                    f'pose; cross edges must connect chunk-boundary poses')
            cross.append((si, sj, m))

    E_max = max(1, max(len(l) for l in local))
    li = np.zeros((P_, E_max), np.int32)
    lj = np.zeros((P_, E_max), np.int32)
    lZ = np.tile(np.eye(4, dtype=Z.dtype), (P_, E_max, 1, 1))
    lw = np.zeros((P_, E_max), w.dtype)
    for p in range(P_):
        for e, m in enumerate(local[p]):
            li[p, e] = ei[m] - p * L
            lj[p, e] = ej[m] - p * L
            lZ[p, e] = Z[m]
            lw[p, e] = w[m]

    E_c = max(1, len(cross))
    ci = np.zeros((E_c,), np.int32)
    cj = np.zeros((E_c,), np.int32)
    cZ = np.tile(np.eye(4, dtype=Z.dtype), (E_c, 1, 1))
    cw = np.zeros((E_c,), w.dtype)
    for e, (si, sj, m) in enumerate(cross):
        ci[e], cj[e], cZ[e], cw[e] = si, sj, Z[m], w[m]

    return PartitionedGraph(graph.poses, jnp.asarray(li), jnp.asarray(lj),
                            jnp.asarray(lZ), jnp.asarray(lw), jnp.asarray(ci),
                            jnp.asarray(cj), jnp.asarray(cZ), jnp.asarray(cw))


def schur_optimize(pg: PartitionedGraph, mesh, iters: int = 10,
                   damping: float = 1e-6, axis_name: str = 'data') -> jnp.ndarray:
    """Distributed Gauss-Newton with Schur-complement elimination.

    Per iteration, on each device (one keyframe chunk each):
      1. build the chunk-local normal system over its L poses;
      2. eliminate the L-2 interior poses:  S_p = H_ss - H_si H_ii^{-1} H_is
         (the Schur complement onto the chunk's two separator poses),
         likewise the reduced rhs;
      3. `psum` the [2P*6, 2P*6] separator system across the mesh, add the
         replicated cross-chunk (separator-separator) edge terms, solve it
         on every device (small, replicated);
      4. back-substitute the interior update locally:
         dx_i = H_ii^{-1} (b_i - H_is dx_s).
    Per-device factorisation cost is O((K/P)^3) instead of the dense
    solve's O(K^3) — the standard partitioned-BA reduction, expressed with
    XLA collectives instead of MPI.

    Returns optimised poses [K, 4, 4].
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    nP, E_max = pg.local_w.shape
    if mesh.size != nP:
        raise ValueError(f'schur_optimize needs one device per partition: '
                         f'graph has {nP} partitions, mesh has {mesh.size} '
                         f'devices')
    K = pg.poses.shape[0]
    L = K // nP
    S_dim = 2 * nP * 6

    def cross_system(sep_poses):
        """Normal equations of the replicated separator-separator edges.
        sep_poses: [2P, 4, 4] -> H [S_dim, S_dim], b [S_dim]."""
        g = PoseGraph(sep_poses, pg.cross_i, pg.cross_j, pg.cross_Z, pg.cross_w)
        r, J_i, J_j = _edge_system(sep_poses, g)
        w = pg.cross_w[:, None, None]
        H = jnp.zeros((2 * nP, 2 * nP, 6, 6), r.dtype)
        H = H.at[pg.cross_i, pg.cross_i].add(jnp.swapaxes(J_i, -1, -2) @ J_i * w)
        H = H.at[pg.cross_j, pg.cross_j].add(jnp.swapaxes(J_j, -1, -2) @ J_j * w)
        Hij = jnp.swapaxes(J_i, -1, -2) @ J_j * w
        H = H.at[pg.cross_i, pg.cross_j].add(Hij)
        H = H.at[pg.cross_j, pg.cross_i].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((2 * nP, 6), r.dtype)
        b = b.at[pg.cross_i].add(jnp.einsum('mab,mb->ma', jnp.swapaxes(J_i, -1, -2) * w, r))
        b = b.at[pg.cross_j].add(jnp.einsum('mab,mb->ma', jnp.swapaxes(J_j, -1, -2) * w, r))
        return H.transpose(0, 2, 1, 3).reshape(S_dim, S_dim), b.reshape(S_dim)

    def step_shard(chunk_poses, li, lj, lZ, lw, sep_poses):
        # shard_map gives leading axis 1 per device: drop it
        chunk_poses, li, lj, lZ, lw = (a[0] for a in (chunk_poses, li, lj, lZ, lw))
        p_id = jax.lax.axis_index(axis_name)

        # chunk-local normal equations over the L chunk poses (no anchor)
        local = PoseGraph(chunk_poses, li, lj, lZ, lw)
        r, J_i, J_j = _edge_system(chunk_poses, local)
        w = lw[:, None, None]
        Hb = jnp.zeros((L, L, 6, 6), r.dtype)
        Hb = Hb.at[li, li].add(jnp.swapaxes(J_i, -1, -2) @ J_i * w)
        Hb = Hb.at[lj, lj].add(jnp.swapaxes(J_j, -1, -2) @ J_j * w)
        Hij = jnp.swapaxes(J_i, -1, -2) @ J_j * w
        Hb = Hb.at[li, lj].add(Hij)
        Hb = Hb.at[lj, li].add(jnp.swapaxes(Hij, -1, -2))
        bb = jnp.zeros((L, 6), r.dtype)
        bb = bb.at[li].add(jnp.einsum('mab,mb->ma', jnp.swapaxes(J_i, -1, -2) * w, r))
        bb = bb.at[lj].add(jnp.einsum('mab,mb->ma', jnp.swapaxes(J_j, -1, -2) * w, r))

        # reorder: separators (pose 0, pose L-1) last
        perm = jnp.concatenate([jnp.arange(1, L - 1), jnp.array([0, L - 1])])
        Hp = Hb[perm][:, perm].transpose(0, 2, 1, 3).reshape(L * 6, L * 6)
        bp = bb[perm].reshape(L * 6)
        nI = (L - 2) * 6
        H_ii = Hp[:nI, :nI] + damping * jnp.eye(nI, dtype=Hp.dtype)
        H_is = Hp[:nI, nI:]                                   # [nI, 12]
        H_ss = Hp[nI:, nI:]                                   # [12, 12]
        b_i, b_s = bp[:nI], bp[nI:]

        # Schur complement onto this chunk's two separators
        H_ii_cho = jax.scipy.linalg.cho_factor(H_ii)
        Y = jax.scipy.linalg.cho_solve(H_ii_cho, H_is)        # H_ii^{-1} H_is
        y = jax.scipy.linalg.cho_solve(H_ii_cho, b_i)
        S_p = H_ss - H_is.T @ Y                               # [12, 12]
        rhs_p = b_s - H_is.T @ y                              # [12]

        # scatter into the global separator system and reduce
        S = jnp.zeros((S_dim, S_dim), S_p.dtype)
        off = p_id * 12
        S = jax.lax.dynamic_update_slice(S, S_p, (off, off))
        rhs = jnp.zeros((S_dim,), rhs_p.dtype)
        rhs = jax.lax.dynamic_update_slice(rhs, rhs_p, (off,))
        S = jax.lax.psum(S, axis_name)
        rhs = jax.lax.psum(rhs, axis_name)

        # replicated cross-chunk edges + gauge anchor on separator 0 (pose 0)
        Hc, bc = cross_system(sep_poses)
        S = S + Hc + damping * jnp.eye(S_dim, dtype=S.dtype)
        S = S + jnp.diag(jnp.zeros(S_dim, S.dtype).at[:6].set(1e6))
        rhs = rhs + bc

        dx_s = -jnp.linalg.solve(S, rhs)                      # [S_dim]
        dx_s_p = jax.lax.dynamic_slice(dx_s, (off,), (12,))
        # back-substitute interior: dx_i = -H_ii^{-1} (b_i + H_is dx_s_p)
        dx_i = -jax.scipy.linalg.cho_solve(H_ii_cho, b_i + H_is @ dx_s_p)

        dx = jnp.zeros((L, 6), dx_i.dtype)
        dx = dx.at[1:L - 1].set(dx_i.reshape(L - 2, 6))
        dx = dx.at[0].set(dx_s_p[:6])
        dx = dx.at[L - 1].set(dx_s_p[6:])
        return (chunk_poses @ se3.exp(dx))[None]

    step = jax.jit(shard_map(
        step_shard, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P()),
        out_specs=P(axis_name)))

    poses = pg.poses
    for _ in range(iters):
        chunks = poses.reshape(nP, L, 4, 4)
        sep = chunks[:, jnp.array([0, L - 1])].reshape(2 * nP, 4, 4)
        chunks = step(chunks, pg.local_i, pg.local_j, pg.local_Z, pg.local_w, sep)
        poses = chunks.reshape(K, 4, 4)
    return poses
