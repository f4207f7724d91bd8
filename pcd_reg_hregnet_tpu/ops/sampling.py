"""Farthest-point sampling (FPS / weighted FPS) — XLA reference implementation.

TPU-native equivalent of the CUDA kernels in
`/root/reference/models/PointUtils/src/furthest_point_sampling_gpu.cu:84-419`.
Semantics match the reference exactly:

* the first selected index is 0;
* a running per-point min-distance array (`temp`, init 1e10) is folded with
  the squared distance to the most recently selected point;
* weighted FPS scales each candidate's distance by the candidate's own
  weight: ``d = w2 * ||p2 - p1||^2`` (cu:299);
* each step selects the argmax of the running min distance.

The selection loop is inherently sequential in the sample index, so it is a
`lax.fori_loop` with a fully vectorised [B, N] distance update per step —
the same dataflow the CUDA kernel parallelises across one thread block.
A Pallas kernel with the distance array pinned in VMEM lives in
`pallas/fps.py`; this module is the correctness reference and CPU fallback.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INIT_DIST = 1e10


_FPS_IMPL: str = None  # resolved lazily once; see _use_pallas / set_fps_impl


def _use_pallas() -> bool:
    """Pallas kernel on TPU backends; XLA fori_loop elsewhere (CPU tests,
    interpret-mode debugging).  Override with PCD_REG_FPS_IMPL=xla|pallas
    before first use, or `set_fps_impl` (resolved once — callers are
    jit-cached, so a mid-process env flip would mix implementations)."""
    global _FPS_IMPL
    if _FPS_IMPL is None:
        import os
        _FPS_IMPL = os.environ.get('PCD_REG_FPS_IMPL', 'auto')
    if _FPS_IMPL == 'xla':
        return False
    if _FPS_IMPL == 'pallas':
        return True
    return jax.default_backend() not in ('cpu',)


def set_fps_impl(impl: str) -> None:
    """Pin the FPS implementation ('xla'|'pallas'|'auto'); clears jit caches."""
    global _FPS_IMPL
    assert impl in ('xla', 'pallas', 'auto'), impl
    _FPS_IMPL = impl
    jax.clear_caches()


@partial(jax.jit, static_argnames=('nsample',))
def fps(xyz: jnp.ndarray, nsample: int) -> jnp.ndarray:
    """Farthest point sampling.

    Args:
        xyz: [B, N, 3] point coordinates.
        nsample: number of points to select (static).
    Returns:
        [B, nsample] int32 indices into N.
    """
    # FPS selection is non-differentiable (integer indices; the reference's
    # autograd Function likewise marks them non-diff) — stop_gradient also
    # keeps jax.grad from tracing a JVP through the Pallas kernel
    xyz = jax.lax.stop_gradient(xyz)
    if _use_pallas():
        from .pallas.fps import fps_pallas
        return fps_pallas(xyz, nsample)
    return _fps_impl(xyz, None, nsample)


@partial(jax.jit, static_argnames=('nsample',))
def weighted_fps(xyz: jnp.ndarray, weights: jnp.ndarray, nsample: int) -> jnp.ndarray:
    """Weighted farthest point sampling (detector-confidence-driven).

    Args:
        xyz: [B, N, 3]; weights: [B, N] per-point scale on the candidate
        distance.  nsample: static sample count.
    Returns:
        [B, nsample] int32 indices.
    """
    xyz = jax.lax.stop_gradient(xyz)
    weights = jax.lax.stop_gradient(weights)
    if _use_pallas():
        from .pallas.fps import weighted_fps_pallas
        return weighted_fps_pallas(xyz, weights, nsample)
    return _fps_impl(xyz, weights, nsample)


def _fps_impl(xyz: jnp.ndarray, weights, nsample: int) -> jnp.ndarray:
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    def step(j, state):
        temp, idxs, last = state
        # last: [B] index of the most recently selected point
        p_last = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum((xyz - p_last) ** 2, axis=-1)  # [B,N]
        if weights is not None:
            d = d * weights
        temp = jnp.minimum(temp, d)
        nxt = jnp.argmax(temp, axis=-1).astype(jnp.int32)  # [B]
        idxs = idxs.at[:, j].set(nxt)
        return temp, idxs, nxt

    temp0 = jnp.full((B, N), _INIT_DIST, dtype=jnp.float32)
    idxs0 = jnp.zeros((B, nsample), dtype=jnp.int32)
    last0 = jnp.zeros((B,), dtype=jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(1, nsample, step, (temp0, idxs0, last0))
    return idxs


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along the point axis: [B, N, C] x [B, M] -> [B, M, C].

    Equivalent of `gather_points_kernel_fast` + its atomicAdd backward
    (`furthest_point_sampling_gpu.cu:7-73`); in JAX the VJP of the gather is
    the scatter-add (a transposed matmul on the one-hot paths), so no custom
    backward is needed.  Accelerators take the (blocked) one-hot-einsum path
    in `ops.neighbors._gather_rows`; CPU keeps `take_along_axis`.
    """
    from .neighbors import _gather_rows
    return _gather_rows(points, idx)
