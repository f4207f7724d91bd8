"""Overlap-aware circle loss (GeoTransformer-style).

TPU-native re-design of `/root/reference/losses/overlap_circle_loss.py:5-120`.
The reference's constructor arguments are overridden by hard-coded values
(`overlap_circle_loss.py:21-27`); those values are the defaults here so the
behaviour matches, but they remain configurable.  The masked row/col means
use `jnp.where` instead of boolean indexing (jit-safe fixed shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def overlap_circle_loss(
    coords_dist: jnp.ndarray,
    feats_dist: jnp.ndarray,
    weights=None,
    pos_radius: float = 1.5,
    safe_radius: float = 0.2,
    log_scale: float = 10.0,
    pos_optimal: float = 0.1,
    neg_optimal: float = 1.4,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
    epsilon: float = 1e-6,
) -> jnp.ndarray:
    """Args: coords_dist, feats_dist [B, N, k] (kNN spatial / feature dists)."""
    pos_mask = coords_dist < pos_radius
    neg_mask = coords_dist > safe_radius

    row_sel = (jnp.sum(pos_mask, -1) > 0) & (jnp.sum(neg_mask, -1) > 0)   # [B,N]
    col_sel = (jnp.sum(pos_mask, -2) > 0) & (jnp.sum(neg_mask, -2) > 0)   # [B,k]

    pos_w = feats_dist - 1e5 * (~pos_mask).astype(feats_dist.dtype)
    pos_w = jax.lax.stop_gradient(jnp.maximum(0.0, pos_w - pos_optimal))
    neg_w = feats_dist + 1e5 * (~neg_mask).astype(feats_dist.dtype)
    neg_w = jax.lax.stop_gradient(jnp.maximum(0.0, neg_optimal - neg_w))

    feats_dist = jnp.clip(feats_dist, epsilon, 1e6)

    lse_pos_row = jax.nn.logsumexp(log_scale * (feats_dist - pos_margin) * pos_w, axis=-1)
    lse_pos_col = jax.nn.logsumexp(log_scale * (feats_dist - pos_margin) * pos_w, axis=-2)
    lse_neg_row = jax.nn.logsumexp(log_scale * (neg_margin - feats_dist) * neg_w, axis=-1)
    lse_neg_col = jax.nn.logsumexp(log_scale * (neg_margin - feats_dist) * neg_w, axis=-2)

    loss_row = jax.nn.softplus(lse_pos_row + lse_neg_row) / log_scale     # [B,N]
    loss_col = jax.nn.softplus(lse_pos_col + lse_neg_col) / log_scale     # [B,k]

    def masked_mean(x, sel):
        s = sel.astype(x.dtype)
        return jnp.sum(x * s) / (jnp.sum(s) + epsilon)

    circle = (masked_mean(loss_row, row_sel) + masked_mean(loss_col, col_sel)) / 2

    if weights is not None:
        w = weights / (jnp.sum(weights, axis=-1, keepdims=True) + epsilon)
        circle = jnp.sum(circle * w) / (jnp.sum(w) + epsilon)
    return circle
