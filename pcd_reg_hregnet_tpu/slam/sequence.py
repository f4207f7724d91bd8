"""Sequence-level registration: clouds -> pairwise poses -> pose graph.

The glue between the registration network (or ICP) and the pose-graph
solvers: given a keyframe stream and an edge list (odometry links +
loop closures), register every edge's pair, chain the odometry edges
into initial world poses, and hand a `PoseGraph` to `optimize` /
`distributed_optimize` / `schur_optimize`.

This layer has no reference counterpart (the reference registers
isolated pairs — SURVEY.md §2.4); it implements the north-star
"sequence-level pose-graph over the sweep stream".  Measurement
convention: an edge (i, j) stores Z_ij = X_i^{-1} X_j, i.e. the
transform returned by registering cloud j (source) onto cloud i
(destination).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from .pose_graph import PoseGraph


RegisterFn = Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]
# (src [E, N, 3], dst [E, N, 3]) -> (T [E, 4, 4] aligning src into dst frame,
#                                    confidence weights [E])


def model_register_fn(model, variables) -> RegisterFn:
    """Adapt a RegistrationModel to the batched edge-registration signature.

    The finest-layer pose is the measurement; the edge weight is the mean
    finest-layer correspondence confidence (sigmoid weights), a cheap
    odometry-quality proxy.
    """

    @jax.jit
    def fn(src, dst):
        out = model.apply(variables, src, dst, train=False)
        R, t = out['rotation'][-1], out['translation'][-1]
        w = jnp.mean(out['src_dst_weights_1'], axis=-1)
        return se3.pack(R, t), w

    return fn


def icp_register_fn(method: str = 'point_to_plane', threshold: float = 1.0,
                    max_iters: int = 30) -> RegisterFn:
    """ICP as the pairwise registrar (works without trained weights)."""
    from ..eval.icp import refine

    @jax.jit
    def fn(src, dst):
        E = src.shape[0]
        init = jnp.broadcast_to(jnp.eye(4, dtype=src.dtype), (E, 4, 4))
        T = refine(src, dst, init, method=method, threshold=threshold,
                   max_iters=max_iters)
        return T, jnp.ones((E,), src.dtype)

    return fn


def build_pose_graph(clouds: jnp.ndarray,
                     edges: Sequence[Tuple[int, int]],
                     register: RegisterFn,
                     init_poses: Optional[jnp.ndarray] = None) -> PoseGraph:
    """Register every edge pair and assemble a PoseGraph.

    Args:
        clouds: [K, N, 3] keyframe clouds, each in its own sensor frame.
        edges: (i, j) index pairs; MUST include the odometry chain
            (k, k+1) for k = 0..K-2 when `init_poses` is None (they seed
            the initial trajectory by chaining).
        register: batched pairwise registrar (see RegisterFn).
        init_poses: optional [K, 4, 4] initial world poses; default chains
            the odometry measurements.
    """
    K = clouds.shape[0]
    ei = jnp.asarray([e[0] for e in edges], jnp.int32)
    ej = jnp.asarray([e[1] for e in edges], jnp.int32)
    # register cloud j onto cloud i: Z_ij = X_i^{-1} X_j
    Z, w = register(clouds[ej], clouds[ei])

    if init_poses is None:
        odo = {(int(a), int(b)): m for a, b, m in
               zip(ei.tolist(), ej.tolist(), Z) if b == a + 1}
        if len(odo) != K - 1:
            raise ValueError('edges must contain the full odometry chain '
                             '(k, k+1) to seed initial poses')
        poses = [jnp.eye(4, dtype=clouds.dtype)]
        for k in range(K - 1):
            poses.append(poses[-1] @ odo[(k, k + 1)])
        init_poses = jnp.stack(poses)

    return PoseGraph(init_poses, ei, ej, Z, w)
