"""Weighted Kabsch / Procrustes pose solve via batched 3x3 SVD.

TPU-native equivalent of `WeightedSVDHead`
(`/root/reference/models/HRegNet/layers.py:456-503`).  Differences by
design:

* the reference wraps `torch.svd` in try/except and falls back to identity
  on failure — exceptions don't exist under jit, so we detect non-finite /
  degenerate covariance with `jnp.where` and select the identity pose
  branchlessly;
* the 3x3 SVD runs through `jnp.linalg.svd`, which XLA batches natively;
  the covariance build is a single [B, 3, N] @ [B, N, 3] matmul (the
  reference materialises an N x N diagonal weight matrix — O(N^2) memory
  for an elementwise scale).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-4


def weighted_kabsch(src: jnp.ndarray, src_corres: jnp.ndarray, weights: jnp.ndarray):
    """Weighted rigid alignment src -> src_corres.

    Args:
        src: [B, N, 3] source points.
        src_corres: [B, N, 3] their (soft) correspondences.
        weights: [B, N] non-negative confidence weights.
    Returns:
        (R [B, 3, 3], t [B, 3]) minimising sum_i w_i ||R src_i + t - corres_i||^2.
    """
    B = src.shape[0]
    w = weights / (jnp.sum(weights, axis=1, keepdims=True) + _EPS)  # [B,N]

    wsum = jnp.sum(w, axis=1)[:, None, None] + _EPS
    src_mean = jnp.einsum('bn,bnc->bc', w, src,
                         precision='highest')[:, None, :] / wsum  # [B,1,3]
    corres_mean = jnp.einsum('bn,bnc->bc', w, src_corres,
                            precision='highest')[:, None, :] / wsum

    src_c = src - src_mean
    corres_c = src_corres - corres_mean

    # cov = src_c^T diag(w) corres_c, as one weighted matmul
    # precision='highest': bf16-quantised covariance (TPU default matmul
    # precision) perturbs the SVD pose by ~0.1 deg — the pose head must
    # not have a metric-scale noise floor (cov is 9N MACs, f32 is free)
    cov = jnp.einsum('bni,bn,bnj->bij', src_c, w, corres_c,
                     precision='highest')  # [B,3,3]

    ok = jnp.all(jnp.isfinite(cov), axis=(1, 2))  # [B]
    cov_safe = jnp.where(ok[:, None, None], cov, jnp.broadcast_to(jnp.eye(3, dtype=cov.dtype), cov.shape))

    u, s, vh = jnp.linalg.svd(cov_safe)
    v = jnp.swapaxes(vh, -1, -2)
    det = jnp.linalg.det(jnp.matmul(v, jnp.swapaxes(u, -1, -2),
                                    precision='highest'))  # [B]
    d = jnp.concatenate([jnp.ones((B, 2), cov.dtype), det[:, None]], axis=1)
    R = jnp.einsum('bik,bk,bjk->bij', v, d, u,
                   precision='highest')  # v @ diag(d) @ u^T

    t = corres_mean[:, 0, :] - jnp.einsum('bij,bj->bi', R, src_mean[:, 0, :],
                                          precision='highest')

    # identity fallback where covariance was non-finite (reference layers.py:485-493)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    R = jnp.where(ok[:, None, None], R, eye)
    t = jnp.where(ok[:, None], t, jnp.zeros_like(t))
    return R, t
