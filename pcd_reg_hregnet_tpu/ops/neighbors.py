"""Brute-force batched k-nearest-neighbour search + grouping, MXU-friendly.

TPU-native equivalent of pytorch3d's `knn_points` / `knn_gather` as consumed
throughout the reference model layers (`/root/reference/models/HRegNet/
layers.py:7,20,278,316,434`).  The point counts in this framework are small
and static (<= 8096), so a dense distance matrix computed as one batched
matmul (`-2 q @ d^T` plus norms) rides the MXU and XLA fuses the top-k; no
spatial acceleration structure is needed or wanted on TPU.

Returns squared distances sorted ascending, matching pytorch3d.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pairwise_sqdist(query: jnp.ndarray, database: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances [B, M, N] between [B, M, D] and [B, N, D]."""
    qn = jnp.sum(query * query, axis=-1, keepdims=True)          # [B,M,1]
    dn = jnp.sum(database * database, axis=-1, keepdims=True)    # [B,N,1]
    cross = jnp.einsum('bmd,bnd->bmn', query, database)          # MXU matmul
    d2 = qn - 2.0 * cross + jnp.swapaxes(dn, -1, -2)
    return jnp.maximum(d2, 0.0)


_TWO_STAGE_CHUNK = 512
# Exact selection: single full-row top_k up to this N (measured faster than
# chunked two-stage below it — the [B, M, c, chunk] reshape lowers badly
# when c is small: 9.4 ms vs 1.9 ms at B4 x M512 x N1024 x k32).
_SINGLE_TOPK_MAX_N = 2048
# Rows at least this wide take the approximate PartialReduce path when
# `approx` is unset.  Below it exact selection is already ~1 ms.
_APPROX_MIN_N = 1024
# recall_target 0.9 measures 0.975 actual recall at k64 x N8096 and is ~3x
# faster than 0.95 (2.0 ms vs 5.9 ms at B8): the PartialReduce reduction
# width is derived from the target, and 0.95 crosses into a much wider
# candidate aggregation.  Override per call for recall-sensitive sites.
_APPROX_RECALL_TARGET = 0.9


@partial(jax.jit, static_argnames=('k', 'approx', 'recall_target'))
def knn(query: jnp.ndarray, database: jnp.ndarray, k: int,
        approx: bool | None = None, recall_target: float | None = None):
    """k nearest neighbours of each query point in the database.

    Two selection strategies over the dense [B, M, N] distance matrix:

    * **exact** (`approx=False`, and the default for N < 1024): two-stage
      top-k.  XLA lowers a single `top_k` over the full matrix to a
      whole-row sort pipeline that materialises several N-wide
      intermediates (measured ~1.6 GB of HBM traffic and ~27 ms for
      B4 x M1024 x N8096 on one chip).  Splitting N into chunks, taking a
      per-chunk top-k, and merging the candidates is mathematically exact
      (every true neighbour is in its chunk's top-k) and sorts only
      chunk-width rows — ~2x faster at these shapes.

    * **approximate** (`approx=True`, and the default for N >= 1024):
      `jax.lax.approx_min_k`, which lowers to the TPU's dedicated
      PartialReduce unit (3.8 ms vs 12 ms exact at B4 x M1024 x N8096,
      0.9 ms vs 1.9 ms at B4 x M512 x N1024 x k32; measured recall 0.975
      at the default recall_target 0.9).  Returned distances
      are exact for the selected elements; only the selected *set* is
      approximate.  On backends without PartialReduce (CPU) XLA falls
      back to an exact sort, so unit tests on the CPU backend see exact
      results either way.  The reference uses exact pytorch3d kNN
      (`/root/reference/models/HRegNet/layers.py:20`); a ~1% neighbour
      swap at the grouping stage is well inside the attention pooling's
      noise floor, and strict call sites can pass `approx=False`.

    Args:
        query: [B, M, D]; database: [B, N, D]; k: static neighbour count;
        approx: force the strategy, or None to choose by N.
    Returns:
        (sqdists [B, M, k], idx [B, M, k] int32), ascending by distance.
    """
    d2 = pairwise_sqdist(query, database)
    if approx is None:
        if _KNN_POLICY == 'exact':
            approx = False
        elif _KNN_POLICY == 'approx':
            approx = True
        else:
            approx = database.shape[1] >= _APPROX_MIN_N
    if approx and k <= database.shape[1]:
        dists, idx = jax.lax.approx_min_k(
            d2, k, recall_target=recall_target or _APPROX_RECALL_TARGET)
        return dists, idx.astype(jnp.int32)
    B, M, N = d2.shape
    chunk = _TWO_STAGE_CHUNK
    if N <= max(2 * k, _SINGLE_TOPK_MAX_N):
        neg_d, idx = jax.lax.top_k(-d2, k)
        return -neg_d, idx.astype(jnp.int32)

    pad = (-N) % chunk
    if pad:
        d2 = jnp.pad(d2, ((0, 0), (0, 0), (0, pad)), constant_values=jnp.inf)
    c = (N + pad) // chunk
    neg_d, ii = jax.lax.top_k(-d2.reshape(B, M, c, chunk), min(k, chunk))
    base = (jnp.arange(c, dtype=jnp.int32) * chunk)[None, None, :, None]
    cand_idx = (ii.astype(jnp.int32) + base).reshape(B, M, -1)
    cand_d = neg_d.reshape(B, M, -1)
    neg_d2, jj = jax.lax.top_k(cand_d, k)
    idx = jnp.take_along_axis(cand_idx, jj, axis=-1)
    return -neg_d2, idx


# Gather strategy on accelerators.  The one-hot-matmul gather beats the
# TPU's serialized dynamic-gather lowering, but generating the [rows, N]
# indicator is VPU-bound: rows*N compare/select lanes dominate (4.0 ms at
# B8 x 65536 x 8096 — dtype of the matmul is irrelevant, measured; a
# split-bf16 variant changed nothing).  Above
# `_BLOCKED_GATHER_MIN_N` a two-stage *blocked* gather splits idx into
# (block, offset) digits: stage 1 gathers whole S-point blocks with an
# [rows, N/S] indicator, stage 2 selects within the block with an [rows, S]
# indicator — rows*(N/S + S) indicator lanes, ~40x less VPU work, bit-exact
# (measured 1.26 ms vs 3.97 ms at the detector-L1 shape, S=8).  For small N
# with wide C the stage-1 [rows, S, C] intermediate costs more than the
# plain indicator, so small N keeps the single one-hot.
_BLOCKED_GATHER_MIN_N = 4096
_GATHER_BLOCK = 8


def _gather_impl() -> str:
    """'taa' (take_along_axis), 'onehot', 'blocked', or 'auto' (default:
    taa on CPU, one-hot/blocked by N on accelerators).  Override with
    PCD_REG_GATHER_IMPL for tests/debugging.

    NOTE: callers are jit-cached functions whose cache is NOT keyed on this
    flag; `set_gather_impl` (or the env var before first trace) is the only
    supported way to change it — flipping the env var mid-process would
    silently mix implementations depending on trace order, so the value is
    resolved once here and pinned."""
    global _GATHER_IMPL
    if _GATHER_IMPL is None:
        import os
        _GATHER_IMPL = os.environ.get('PCD_REG_GATHER_IMPL', 'auto')
    return _GATHER_IMPL


_GATHER_IMPL: str = None  # resolved lazily once; see _gather_impl


_KNN_POLICY: str = 'auto'  # 'auto' (by N) | 'exact' | 'approx'


def set_knn_policy(policy: str) -> None:
    """Pin the global kNN default for call sites that pass ``approx=None``
    ('auto' = choose by N).  For end-to-end exact-vs-approx A/B runs
    (VERDICT r1 next-step #5); clears jit caches so traces re-specialise."""
    global _KNN_POLICY
    assert policy in ('auto', 'exact', 'approx'), policy
    _KNN_POLICY = policy
    jax.clear_caches()


def set_gather_impl(impl: str) -> None:
    """Pin the gather implementation ('taa'|'onehot'|'blocked'|'auto').

    Must be called before the first traced use; clears JAX's jit caches so
    tests switching implementations re-trace."""
    global _GATHER_IMPL
    assert impl in ('taa', 'onehot', 'blocked', 'auto'), impl
    _GATHER_IMPL = impl
    jax.clear_caches()


def _bf16_parts(x: jnp.ndarray) -> list[jnp.ndarray]:
    """Split f32 into 3 exactly-bf16-representable f32 parts (8+8+8 of the
    24 mantissa bits): x == sum(parts) exactly, and a DEFAULT-precision MXU
    matmul of each part against a 0/1 indicator is exact (1.0 x bf16 value
    accumulates in f32 with one nonzero term per row).

    Why: TPU default matmul precision rounds operands to bf16 — measured
    0.125 m absolute error on gathered 60 m-scale coordinates
    (results/precision_probe.json), which poisoned keypoint geometry
    everywhere.  3 one-hot matmuls on the split parts give bit-exact f32
    gathers at MXU speed (the [rows, N] indicator generation, the actual
    cost driver, is shared)."""
    if x.dtype != jnp.float32:
        return [x]
    h1 = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - h1
    h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    return [h1, h2, r1 - h2]


def _gather_rows(data: jnp.ndarray, idx: jnp.ndarray,
                 exact_channels: int | None = None) -> jnp.ndarray:
    """Row gather [B, N, C] x [B, R] -> [B, R, C] (int32 idx).

    `exact_channels`: how many LEADING channels must be bit-exact f32
    (None = all).  Geometry channels (xyz) must be exact — bf16-rounded
    coordinates put ~0.12 m of noise into every keypoint
    (results/precision_probe.json) — while learned feature channels
    tolerate bf16-level (~0.4% relative) noise, far below BN/training
    noise.  The exact part costs 3 matmul passes (`_bf16_parts`), the
    rest one; the [rows, N] indicator (the real cost driver) is shared.
    """
    B, N, C = data.shape
    impl = _gather_impl()
    if impl == 'taa' or (impl == 'auto' and jax.default_backend() == 'cpu'):
        return jnp.take_along_axis(data, idx[..., None], axis=1)
    ex = C if exact_channels is None else min(exact_channels, C)

    def one_hot_gather(onehot, part):
        return jnp.einsum('brn,bnc->brc', onehot, part)

    if impl == 'onehot' or (impl != 'blocked' and N < _BLOCKED_GATHER_MIN_N):
        onehot = jax.nn.one_hot(idx, N, dtype=data.dtype)     # [B,R,N]
        pieces = []
        if ex:
            pieces.append(sum(one_hot_gather(onehot, p)
                              for p in _bf16_parts(data[..., :ex])))
        if ex < C:
            pieces.append(one_hot_gather(onehot, data[..., ex:]))
        return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, -1)

    S = _GATHER_BLOCK
    pad = (-N) % S
    if pad:
        data = jnp.pad(data, ((0, 0), (0, pad), (0, 0)))
    nb = (N + pad) // S
    R = idx.shape[1]
    oh_hi = jax.nn.one_hot(idx // S, nb, dtype=data.dtype)    # [B,R,nb]
    oh_lo = jax.nn.one_hot(idx % S, S, dtype=data.dtype)      # [B,R,S]

    def blocked(part):
        c = part.shape[-1]
        blocks = part.reshape(B, nb, S * c)
        g1 = jnp.einsum('brn,bnd->brd', oh_hi, blocks)        # [B,R,S*c]
        g1 = g1.reshape(B, R, S, c)
        # stage 2 selects from g1; for _bf16_parts inputs the entries are
        # exactly bf16-representable, so default precision stays exact
        return jnp.einsum('brs,brsc->brc', oh_lo, g1)

    pieces = []
    if ex:
        pieces.append(sum(blocked(p) for p in _bf16_parts(data[..., :ex])))
    if ex < C:
        pieces.append(blocked(data[..., ex:]))
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, -1)


def knn_gather(data: jnp.ndarray, idx: jnp.ndarray,
               exact_channels: int | None = None) -> jnp.ndarray:
    """Gather neighbour features: [B, N, C] x [B, M, k] -> [B, M, k, C].

    On accelerator backends this is a (blocked) one-hot einsum riding the
    MXU; the CPU backend keeps the `take_along_axis` lowering.
    `exact_channels` marks how many leading channels are geometry and
    must be bit-exact f32 (None = all); see `_gather_rows`.
    """
    B, M, k = idx.shape
    out = _gather_rows(data, idx.reshape(B, M * k), exact_channels)
    return out.reshape(B, M, k, data.shape[-1])


@partial(jax.jit, static_argnames=('k',))
def ball_query(query: jnp.ndarray, database: jnp.ndarray, radius: float,
               k: int):
    """Fixed-radius neighbourhood query (PointNet++-style ball query).

    TPU-native equivalent of the ball-query grouping op family the
    reference's PointUtils kernels belong to (the reference itself groups
    with kNN — `models/HRegNet/layers.py:20` — but ball query is part of
    the same CUDA op suite).  Returns up to `k` neighbours within
    `radius`; rows with fewer than `k` in-radius points repeat their
    first valid neighbour (the CUDA convention), and a validity mask is
    returned for callers that need exact counts.

    Dense distance matrix + top_k of the masked distances.  Deviation
    from the CUDA kernel: it keeps the first k in-radius points in *index
    order* (a scan-order artifact); we return the k *nearest* in-radius
    points — same in-radius guarantee, better neighbourhoods.

    Returns:
        idx [B, M, k] int32 (0 where a row has no in-radius point at all),
        mask [B, M, k] bool (True = within radius).
    """
    # |q|^2+|d|^2-2qd expansion: f32 error at |d|~radius makes the boundary
    # fuzzy at lsb level (and d2 can go slightly negative) — clamp to >=0;
    # the radius itself remains approximate at ~1 ulp of the expansion.
    d2 = jnp.maximum(pairwise_sqdist(query, database), 0.0)
    r2 = radius * radius
    masked = jnp.where(d2 <= r2, d2, jnp.inf)
    neg_d, idx = jax.lax.top_k(-masked, k)
    mask = jnp.isfinite(neg_d)
    # pad short rows with the first valid neighbour (CUDA convention);
    # rows with NO in-radius point get index 0 + all-False mask (top_k over
    # an all-inf row returns arbitrary indices otherwise)
    first = jnp.where(mask[..., :1], idx[..., :1], 0)
    idx = jnp.where(mask, idx, first)
    return idx.astype(jnp.int32), mask


@partial(jax.jit, static_argnames=())
def three_nn_interpolate(query: jnp.ndarray, database: jnp.ndarray,
                         features: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance-weighted 3-NN feature interpolation.

    The PointNet++ `three_nn` + `three_interpolate` pair (the upsampling
    counterpart of the reference's PointUtils gather kernels): each query
    point receives the distance-weighted average of the features of its 3
    nearest database points.

    Args:
        query [B, M, 3]; database [B, N, 3]; features [B, N, C].
    Returns:
        [B, M, C] interpolated features.
    """
    d2, idx = knn(query, database, 3, approx=False)
    w = 1.0 / (d2 + 1e-8)                                  # [B,M,3]
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    neigh = knn_gather(features, idx, exact_channels=0)    # [B,M,3,C]
    return jnp.einsum('bmk,bmkc->bmc', w, neigh)


@partial(jax.jit, static_argnames=('k', 'approx'))
def knn_group(xyz1: jnp.ndarray, xyz2: jnp.ndarray, features2, k: int,
              approx: bool | None = None):
    """kNN grouping with relative-position features.

    Re-designs `knn_group` (`/root/reference/models/HRegNet/layers.py:9-27`)
    in channels-last layout (natural for TPU conv/matmul lowering; the
    reference permutes to channels-first for torch Conv2d).

    Args:
        xyz1: query points [B, M, 3];  xyz2: database [B, N, 3];
        features2: [B, N, C] or None;  k: static.
    Returns:
        grouped: [B, M, k, 4 + C] = concat(rel_xyz, rel_dist, neigh_feats)
        knn_xyz: [B, M, k, 3] neighbour coordinates.
    """
    _, idx = knn(xyz1, xyz2, k, approx=approx)
    # single fused gather of [xyz | features]: one indicator pass instead of
    # two (the indicator generation dominates gather cost — see _gather_rows);
    # xyz channels bit-exact, feature channels at single-pass MXU precision
    db = xyz2 if features2 is None else jnp.concatenate([xyz2, features2], axis=-1)
    g = knn_gather(db, idx, exact_channels=3)           # [B,M,k,3+C]
    knn_xyz = g[..., :3]
    rela_xyz = knn_xyz - xyz1[:, :, None, :]            # [B,M,k,3]
    # sqrt with epsilon: query points may be exact database points (FPS
    # keypoints are), and norm-at-zero has a NaN gradient
    rela_dist = jnp.sqrt(jnp.sum(rela_xyz * rela_xyz, axis=-1, keepdims=True) + 1e-12)
    parts = [rela_xyz, rela_dist]
    if features2 is not None:
        parts.append(g[..., 3:])
    return jnp.concatenate(parts, axis=-1), knn_xyz
