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
