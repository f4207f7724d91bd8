"""HRegNet model layers — flax.linen, channels-last, fixed shapes.

TPU-native re-design of `/root/reference/models/HRegNet/layers.py` (and the
per-variant copies under `models/model_v{1..6}/layers.py`).  Everything is
channels-last ([B, N, C] / [B, M, k, C]) so the 1x1 Conv2d stacks of the
reference become Dense layers that XLA lowers straight onto the MXU; the
reference's per-row Python loop for the similarity diagonals
(`HRegNet/layers.py:306-313,355-362`) becomes a single `take_along_axis`.

BatchNorm matches torch semantics (stats over all axes but channels) and
accepts an `axis_name` so data-parallel training syncs stats with `psum`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.neighbors import knn, knn_gather, knn_group
from ..ops.procrustes import weighted_kabsch
from ..ops.sampling import fps, gather_points, weighted_fps
from ..geometry import so3


def _safe_dist(v: jnp.ndarray) -> jnp.ndarray:
    """Euclidean norm over the last axis with finite gradient at 0.

    FPS keypoints are exact database points, so kNN relative vectors can be
    exactly zero; `jnp.linalg.norm` would give NaN gradients there.
    """
    return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)


class ConvBNReLU(nn.Module):
    """Stack of (pointwise Dense -> BatchNorm -> ReLU), torch Conv(1x1)+BN+ReLU.

    `dtype` sets the matmul compute precision (bfloat16 doubles MXU
    throughput).  In TRAIN mode BatchNorm runs float32 (batch statistics
    at small batches are precision-sensitive) — which also means every
    bf16 Dense is bracketed by f32 activations, so bf16 training gains
    little.  In EVAL mode BN is a frozen affine (running stats, no
    updates), so it runs in the compute dtype and activations stay bf16
    end-to-end through the stack (stats themselves remain f32 variables).
    """
    features: Sequence[int]
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn_dtype = jnp.float32 if train else self.dtype
        for f in self.features:
            x = nn.Dense(f, use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis_name=self.axis_name,
                             dtype=bn_dtype)(x)
            x = nn.relu(x)
        return x


class MLPHead(nn.Module):
    """mlp1/mlp2 (Dense+BN+ReLU) then a final biased Dense (reference's mlp3)."""
    hidden: Sequence[int]
    out: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # same dtype policy as ConvBNReLU: f32 BN in train, compute-dtype
        # (bf16-capable) frozen-affine BN in eval
        bn_dtype = jnp.float32 if train else self.dtype
        for f in self.hidden:
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis_name=self.axis_name,
                             dtype=bn_dtype)(x)
            x = nn.relu(x)
        return nn.Dense(self.out)(x)


class KeypointDetector(nn.Module):
    """Attentive keypoint detection on (W)FPS-sampled neighbourhoods.

    Re-designs `KeypointDetector` (`HRegNet/layers.py:89-165`): (W)FPS ->
    kNN group -> conv stack -> channel-max -> softmax over k -> attention-
    weighted keypoint xyz + feature; sigma head = 3 MLPs + softplus + 1e-3.

    Inputs:  xyz [B, N, 3], features [B, N, C] or None, weights [B, N] or None.
    Returns: (keypoints [B, M, 3], sigmas [B, M], attentive_feature [B, M, C_o],
              grouped_features [B, M, k, C+4], attentive_feature_map [B, M, k, C_o]).
    """
    nsample: int
    k: int
    out_channels: Sequence[int]
    use_fps: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, features=None, weights=None, train: bool = False):
        if xyz.shape[1] < self.nsample:
            raise ValueError(
                f'KeypointDetector(nsample={self.nsample}) needs at least '
                f'{self.nsample} input points, got {xyz.shape[1]}; reduce the '
                f'level nsample (ModelConfig.levels) or raise pcd_min_samples')
        if self.use_fps:
            if weights is None:
                idx = fps(xyz, self.nsample)
            else:
                idx = weighted_fps(xyz, weights, self.nsample)
            sampled_xyz = gather_points(xyz, idx)
        else:
            # random sampling path (reference layers.py:144-147); deterministic
            # stride-subsample here since jit-time randomness would need a key
            stride = xyz.shape[1] // self.nsample
            sampled_xyz = xyz[:, :: stride][:, : self.nsample]

        grouped, knn_xyz = knn_group(sampled_xyz, xyz, features, self.k)
        embedding = ConvBNReLU(self.out_channels, axis_name=self.axis_name, dtype=self.dtype)(grouped, train)
        c_o = self.out_channels[-1]

        x1 = jnp.max(embedding, axis=-1)                 # [B,M,k] channel max
        attn = jax.nn.softmax(x1, axis=-1)               # softmax over k
        keypoints = jnp.sum(attn[..., None] * knn_xyz, axis=2)           # [B,M,3]
        attentive_map = embedding * attn[..., None]                       # [B,M,k,C_o]
        attentive_feature = jnp.sum(attentive_map, axis=2)                # [B,M,C_o]

        sigmas = MLPHead((c_o, c_o), 1, axis_name=self.axis_name, dtype=self.dtype)(attentive_feature, train)
        sigmas = jax.nn.softplus(sigmas)[..., 0] + 0.001                  # [B,M]
        return keypoints, sigmas, attentive_feature, grouped, attentive_map


class DescExtractor(nn.Module):
    """Descriptor extraction from grouped neighbourhoods.

    Re-designs `DescExtractor` (`HRegNet/layers.py:167-209`): conv stack,
    concat [tiled k-max, per-point, detector attention map], 2 MLPs, k-max.
    """
    out_channels: Sequence[int]
    desc_dim: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grouped_features, attentive_feature_map, train: bool = False):
        x1 = ConvBNReLU(self.out_channels, axis_name=self.axis_name, dtype=self.dtype)(grouped_features, train)
        k = x1.shape[2]
        x2 = jnp.max(x1, axis=2, keepdims=True)          # [B,M,1,C]
        x2 = jnp.broadcast_to(x2, x1.shape)
        x = jnp.concatenate([x2, x1, attentive_feature_map], axis=-1)
        x = ConvBNReLU((self.out_channels[-2],), axis_name=self.axis_name, dtype=self.dtype)(x, train)
        x = ConvBNReLU((self.desc_dim,), axis_name=self.axis_name, dtype=self.dtype)(x, train)
        return jnp.max(x, axis=2)                        # [B,M,desc_dim]


def _cosine_similarity_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full cosine-similarity map [B, Na, Nb] from [B, Na, C], [B, Nb, C].

    One MXU matmul replaces the reference's [B, N, N, C] materialisation
    (`HRegNet/layers.py:292-295` expands to N^2 x C before reducing).
    """
    inner = jnp.einsum('bic,bjc->bij', a, b)
    na = jnp.sqrt(jnp.sum(a * a, axis=-1) + 1e-12)
    nb = jnp.sqrt(jnp.sum(b * b, axis=-1) + 1e-12)
    return inner / (na[:, :, None] * nb[:, None, :] + 1e-6)


class CoarseReg(nn.Module):
    """Coarse correspondence via descriptor-space kNN + similarity features.

    Re-designs `CoarseReg` (`HRegNet/layers.py:211-396`).  `return_dists`
    adds the model_v4/v6 overlap-circle outputs (coord_dist, feats_dist —
    `model_v4/layers.py:252,281-282`); `mi_outputs` adds the model_v1
    MI-estimator outputs (mlpx projection + batch-rolled primes —
    `model_v1/layers.py:346-356`).
    """
    k: int
    in_channels: int
    use_sim: bool = True
    use_neighbor: bool = True
    return_dists: bool = False
    mi_outputs: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, src_xyz, src_desc, dst_xyz, dst_desc,
                 src_weights, dst_weights, train: bool = False):
        B, N, C = src_desc.shape
        k = self.k
        _, knn_idx = knn(src_desc, dst_desc, k)          # desc-space kNN
        # one fused gather of [xyz | desc | weight]: indicator generation
        # dominates gather cost, so pay it once (see ops.neighbors._gather_rows)
        g = knn_gather(jnp.concatenate(
            [dst_xyz, dst_desc, dst_weights[..., None]], axis=-1), knn_idx,
            exact_channels=3)
        src_knn_xyz = g[..., :3]                          # [B,N,k,3]
        src_knn_desc = g[..., 3:3 + C]                    # [B,N,k,C]
        src_knn_w = g[..., 3 + C:]                        # [B,N,k,1]

        src_xyz_expand = jnp.broadcast_to(src_xyz[:, :, None, :], (B, N, k, 3))
        src_desc_expand = jnp.broadcast_to(src_desc[:, :, None, :], (B, N, k, C))
        src_rela_xyz = src_knn_xyz - src_xyz_expand
        src_rela_dist = _safe_dist(src_rela_xyz)
        src_w_expand = jnp.broadcast_to(src_weights[:, :, None, None], (B, N, k, 1))

        sim_parts = []
        feats_dist = None
        if self.use_sim:
            cos = _cosine_similarity_matrix(src_desc, dst_desc)  # [B,N1,N2]
            # row-normalized (per src point) and column-normalized (per dst point)
            src_dst_norm = cos / (jnp.max(cos, axis=2, keepdims=True) + 1e-6)
            dst_src_norm = cos / (jnp.max(cos, axis=1, keepdims=True) + 1e-6)
            # gather at the kNN columns — replaces the reference's O(N) python
            # loop over diagonal entries (layers.py:306-313)
            src_dst_cos = jnp.take_along_axis(src_dst_norm, knn_idx, axis=2)  # [B,N,k]
            dst_src_cos = jnp.take_along_axis(dst_src_norm, knn_idx, axis=2)  # [B,N,k]
            sim_parts += [src_dst_cos[..., None], dst_src_cos[..., None]]
            feats_dist = 1.0 - dst_src_cos                       # model_v4/layers.py:281

        if self.use_neighbor:
            nbr_convs = ConvBNReLU((self.in_channels,) * 3, axis_name=self.axis_name, dtype=self.dtype)

            def nbr_desc(xyz, desc):
                _, nbr_idx = knn(xyz, xyz, k)
                ng = knn_gather(jnp.concatenate([xyz, desc], -1), nbr_idx,
                                exact_channels=3)
                nbr_xyz, nbr_feats = ng[..., :3], ng[..., 3:]
                rela = nbr_xyz - xyz[:, :, None, :]
                dist = _safe_dist(rela)
                x = jnp.concatenate([nbr_feats, rela, dist], axis=-1)
                w = nbr_convs(x, train)
                w = jax.nn.softmax(jnp.max(w, axis=-1), axis=-1)  # [B,N,k]
                return jnp.sum(nbr_feats * w[..., None], axis=2)  # [B,N,C]

            src_nbr = nbr_desc(src_xyz, src_desc)
            dst_nbr = nbr_desc(dst_xyz, dst_desc)
            ncos = _cosine_similarity_matrix(src_nbr, dst_nbr)
            src_dst_nnorm = ncos / (jnp.max(ncos, axis=2, keepdims=True) + 1e-6)
            dst_src_nnorm = ncos / (jnp.max(ncos, axis=1, keepdims=True) + 1e-6)
            sim_parts += [
                jnp.take_along_axis(src_dst_nnorm, knn_idx, axis=2)[..., None],
                jnp.take_along_axis(dst_src_nnorm, knn_idx, axis=2)[..., None],
            ]

        geom = jnp.concatenate([src_rela_xyz, src_rela_dist, src_xyz_expand, src_knn_xyz], axis=-1)
        desc = jnp.concatenate([src_desc_expand, src_knn_desc, src_w_expand, src_knn_w], axis=-1)
        feats = jnp.concatenate([geom, desc] + sim_parts, axis=-1)

        feats = ConvBNReLU((2 * self.in_channels,) * 3, axis_name=self.axis_name, dtype=self.dtype)(feats, train)
        attn = jax.nn.softmax(jnp.max(feats, axis=-1), axis=-1)   # [B,N,k]
        corres_xyz = jnp.sum(attn[..., None] * src_knn_xyz, axis=2)
        attentive_feats = jnp.sum(attn[..., None] * feats, axis=2)  # [B,N,2C]

        w = MLPHead((2 * self.in_channels,) * 2, 1, axis_name=self.axis_name, dtype=self.dtype)(attentive_feats, train)
        weights = jax.nn.sigmoid(w[..., 0])

        if self.mi_outputs:
            mi_feats = ConvBNReLU((self.in_channels,), axis_name=self.axis_name, dtype=self.dtype)(attentive_feats, train)
            return (corres_xyz, weights, jnp.roll(weights, 1, axis=0),
                    mi_feats, jnp.roll(mi_feats, 1, axis=0))
        if self.return_dists:
            coord_dist = src_rela_dist[..., 0]                    # [B,N,k]
            return corres_xyz, weights, coord_dist, feats_dist
        return corres_xyz, weights


class FineReg(nn.Module):
    """Fine correspondence via xyz-space kNN.

    Re-designs `FineReg`/`FineReg1` (`HRegNet/layers.py:398-454`).  With
    `mi_outputs=True` it becomes `FineReg2` (`model_v6/layers.py:445-504`):
    an extra `mlpx` projection plus batch-permuted "prime" negatives for
    the MI loss.  The reference draws negatives with `torch.randperm(B)`;
    here we roll the batch axis by one — deterministic, jit-safe, and the
    same construction its MI estimator assumes (mismatched pairs).
    """
    k: int
    in_channels: int
    mi_outputs: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, src_xyz, src_feat, dst_xyz, dst_feat,
                 src_weights, dst_weights, train: bool = False):
        B, N, C = src_feat.shape
        k = self.k
        _, knn_idx = knn(src_xyz, dst_xyz, k)
        g = knn_gather(jnp.concatenate(
            [dst_xyz, dst_feat, dst_weights[..., None]], axis=-1), knn_idx,
            exact_channels=3)
        src_knn_xyz, src_knn_feat, src_knn_w = g[..., :3], g[..., 3:3 + C], g[..., 3 + C:]
        src_xyz_expand = jnp.broadcast_to(src_xyz[:, :, None, :], (B, N, k, 3))
        src_feat_expand = jnp.broadcast_to(src_feat[:, :, None, :], (B, N, k, C))
        rela = src_knn_xyz - src_xyz_expand
        dist = _safe_dist(rela)
        src_w_expand = jnp.broadcast_to(src_weights[:, :, None, None], (B, N, k, 1))

        feats = jnp.concatenate([rela, dist, src_xyz_expand, src_knn_xyz,
                                 src_feat_expand, src_knn_feat,
                                 src_w_expand, src_knn_w], axis=-1)
        feats = ConvBNReLU((2 * self.in_channels,) * 3, axis_name=self.axis_name, dtype=self.dtype)(feats, train)
        attn = jax.nn.softmax(jnp.max(feats, axis=-1), axis=-1)
        corres_xyz = jnp.sum(attn[..., None] * src_knn_xyz, axis=2)
        attentive_feats = jnp.sum(attn[..., None] * feats, axis=2)   # [B,N,2C]

        w = MLPHead((2 * self.in_channels,) * 2, 1, axis_name=self.axis_name, dtype=self.dtype)(attentive_feats, train)
        weights = jax.nn.sigmoid(w[..., 0])

        if not self.mi_outputs:
            return corres_xyz, weights

        mi_feats = ConvBNReLU((self.in_channels,), axis_name=self.axis_name, dtype=self.dtype)(attentive_feats, train)
        mi_feats_prime = jnp.roll(mi_feats, 1, axis=0)
        weights_prime = jnp.roll(weights, 1, axis=0)
        return corres_xyz, weights, weights_prime, mi_feats, mi_feats_prime


class SVDHead(nn.Module):
    """Parameter-free weighted-Kabsch pose head (`HRegNet/layers.py:456-503`)."""

    def __call__(self, src, src_corres, weights):
        return weighted_kabsch(src, src_corres, weights)


class RegressionHead(nn.Module):
    """MLP pose regression head (model_v3/layers.py:625-672).

    Maps the concatenated weighted centroids [B, 6] to an axis-angle
    rotation (exp'd to a matrix by the caller) and a translation.
    """

    @nn.compact
    def __call__(self, src, src_corres, weights):
        w = weights / (jnp.sum(weights, axis=1, keepdims=True) + 1e-4)
        src_mean = jnp.einsum('bn,bnc->bc', w, src)
        corres_mean = jnp.einsum('bn,bnc->bc', w, src_corres)
        x = jnp.concatenate([src_mean, corres_mean], axis=-1)     # [B,6]

        xr = nn.relu(nn.Dense(128)(x))
        xr = nn.relu(nn.Dense(64)(xr))
        rot_vec = nn.Dense(3)(xr)

        xt = nn.relu(nn.Dense(128)(x))
        xt = nn.relu(nn.Dense(64)(xt))
        trans = nn.Dense(3)(xt)
        return so3.exp(rot_vec), trans


class Regression6DHead(nn.Module):
    """6D-rotation regression head (model_v3/layers.py:555-622, unused by
    the reference's experiments but part of its API surface)."""

    @nn.compact
    def __call__(self, src, src_corres, weights):
        w = weights / (jnp.sum(weights, axis=1, keepdims=True) + 1e-4)
        src_mean = jnp.einsum('bn,bnc->bc', w, src)
        corres_mean = jnp.einsum('bn,bnc->bc', w, src_corres)
        x = jnp.concatenate([src_mean, corres_mean], axis=-1)

        h = nn.relu(nn.Dense(128)(x))
        h = nn.relu(nn.Dense(64)(h))
        rot6d = nn.Dense(6)(h)
        trans = nn.Dense(3)(nn.relu(nn.Dense(64)(nn.relu(nn.Dense(128)(x)))))

        m = rot6d.reshape(-1, 3, 2)
        b1 = m[:, :, 0] / (jnp.linalg.norm(m[:, :, 0], axis=-1, keepdims=True) + 1e-6)
        proj = jnp.sum(b1 * m[:, :, 1], axis=-1, keepdims=True) * b1
        b2 = m[:, :, 1] - proj
        b2 = b2 / (jnp.linalg.norm(b2, axis=-1, keepdims=True) + 1e-6)
        b3 = jnp.cross(b1, b2)
        R = jnp.stack([b1, b2, b3], axis=-1)
        return R, trans
