"""On-device ICP refinement (point-to-point and point-to-plane).

The reference defers ICP to Open3D on the CPU as a 4th refinement layer
(`/root/reference/test/test_v4.py:140-173`: point-to-point, threshold 1.0,
max 2000 iters; README also reports point-to-plane rows).  On TPU we run
ICP as a jitted fixed-iteration solver — each iteration is one MXU
distance matrix + a closed-form update, so refinement stays on-device in
the same jit as the network instead of a host round-trip.

Both variants reject correspondences beyond `threshold` via zero weights
(branchless equivalent of Open3D's correspondence distance cut).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..ops.neighbors import _gather_rows, knn, pairwise_sqdist
from ..ops.procrustes import weighted_kabsch


def _nn(src: jnp.ndarray, dst: jnp.ndarray):
    """Nearest neighbour of each src point in dst: (sqdist [B,N], idx [B,N])."""
    d2 = pairwise_sqdist(src, dst)
    return jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=('max_iters',))
def icp_point_to_point(src: jnp.ndarray, dst: jnp.ndarray,
                       init_T: jnp.ndarray, threshold: float = 1.0,
                       max_iters: int = 30) -> jnp.ndarray:
    """Point-to-point ICP.  src/dst [B, N, 3]; init_T [B, 4, 4] -> [B, 4, 4]."""

    def step(_, T):
        cur = se3.transform(T, src)
        d2, idx = _nn(cur, dst)
        corres = _gather_rows(dst, idx)
        w = (d2 < threshold * threshold).astype(src.dtype)
        # guard: if everything is rejected fall back to uniform weights
        any_w = jnp.sum(w, axis=1, keepdims=True) > 0
        w = jnp.where(any_w, w, jnp.ones_like(w))
        R, t = weighted_kabsch(cur, corres, w)
        return se3.compose(se3.pack(R, t), T)

    return jax.lax.fori_loop(0, max_iters, step, init_T)


@partial(jax.jit, static_argnames=('k',))
def estimate_normals(points: jnp.ndarray, k: int = 16) -> jnp.ndarray:
    """Per-point normals via local PCA (smallest-eigenvector of the kNN
    covariance).  Replaces Open3D's estimate_normals for point-to-plane."""
    # exact neighbours: approximate kNN recall is fine for grouping convs
    # but per-point PCA normals feed point-to-plane residuals directly
    _, idx = knn(points, points, k, approx=False)
    B, N, _ = points.shape
    nbrs = _gather_rows(points, idx.reshape(B, N * k))
    nbrs = nbrs.reshape(B, N, k, 3)
    centered = nbrs - jnp.mean(nbrs, axis=2, keepdims=True)
    cov = jnp.einsum('bnki,bnkj->bnij', centered, centered) / k
    # eigh returns ascending eigenvalues: column 0 is the normal direction
    _, vecs = jnp.linalg.eigh(cov)
    return vecs[..., 0]


@partial(jax.jit, static_argnames=('max_iters',))
def icp_point_to_plane(src: jnp.ndarray, dst: jnp.ndarray,
                       dst_normals: jnp.ndarray, init_T: jnp.ndarray,
                       threshold: float = 1.0, max_iters: int = 30) -> jnp.ndarray:
    """Point-to-plane ICP via the small-angle linearised normal equations.

    Each step solves  min_x sum_i w_i ((J_i x) + r_i)^2  with
    J_i = [p_i x n_i, n_i] (x = [w, v] twist) in closed form (6x6 solve).
    """

    def step(_, T):
        cur = se3.transform(T, src)
        d2, idx = _nn(cur, dst)
        # fused single gather of [dst | normals] (one indicator pass)
        qn_ = _gather_rows(jnp.concatenate([dst, dst_normals], -1), idx)
        q, n = qn_[..., :3], qn_[..., 3:]
        w = (d2 < threshold * threshold).astype(src.dtype)
        any_w = jnp.sum(w, axis=1, keepdims=True) > 0
        w = jnp.where(any_w, w, jnp.ones_like(w))

        r = jnp.sum((cur - q) * n, axis=-1)                          # [B,N]
        J = jnp.concatenate([jnp.cross(cur, n), n], axis=-1)         # [B,N,6]
        JTJ = jnp.einsum('bn,bni,bnj->bij', w, J, J)
        JTr = jnp.einsum('bn,bni,bn->bi', w, J, r)
        JTJ = JTJ + 1e-6 * jnp.eye(6, dtype=src.dtype)
        x = -jnp.linalg.solve(JTJ, JTr[..., None])[..., 0]           # [B,6]
        # trust region: the linearisation is only locally valid; clamp the
        # twist so a bad initial pose cannot blow up to inf/NaN
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = x * jnp.minimum(1.0, 1.0 / (norm + 1e-12))
        x = jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))
        return se3.compose(se3.exp(x), T)

    return jax.lax.fori_loop(0, max_iters, step, init_T)


def refine(src: jnp.ndarray, dst: jnp.ndarray, init_T: jnp.ndarray,
           method: str = 'point_to_point', threshold: float = 1.0,
           max_iters: int = 30) -> jnp.ndarray:
    """ICP refinement dispatch (the reference's test_v4 'layer 4')."""
    if method == 'point_to_point':
        return icp_point_to_point(src, dst, init_T, threshold, max_iters)
    if method == 'point_to_plane':
        normals = estimate_normals(dst)
        return icp_point_to_plane(src, dst, normals, init_T, threshold, max_iters)
    raise ValueError(f'unknown ICP method {method!r}')
