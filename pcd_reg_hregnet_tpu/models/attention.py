"""Model_V5: self-attention detectors + cross-attention correspondence.

Re-designs `/root/reference/models/model_v5/conv2d/` (layers.py:71-235,
models.py:9-162): detectors replace the max/softmax attention with QKV
self-attention over the grouped neighbourhood; correspondences come from
multi-head cross-attention between levels' feature sets instead of kNN
matching.

Note: the reference's `train_reg_v10.py:127-132` consumes MI tensors whose
production is commented out in Model_V5 (`models.py:152-157`) — the script
is broken as shipped.  Here the MI outputs are produced the same way
FineReg2 builds them (projection + batch-rolled primes) from the level-2
cross-attended features, so the reg_v10 experiment runs.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import ModelConfig
from ..geometry import se3
from .layers import ConvBNReLU, MLPHead, SVDHead
from ..ops.neighbors import knn_group
from ..ops.sampling import fps, gather_points, weighted_fps


class KeypointDetectorSelfAttention(nn.Module):
    """Self-attention keypoint detector (`conv2d/layers.py:71-148`)."""
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
                f'KeypointDetectorSelfAttention(nsample={self.nsample}) needs '
                f'at least {self.nsample} input points, got {xyz.shape[1]}')
        if self.use_fps:
            idx = (fps(xyz, self.nsample) if weights is None else
                   weighted_fps(xyz, weights, self.nsample))
            sampled_xyz = gather_points(xyz, idx)
        else:
            stride = xyz.shape[1] // self.nsample
            sampled_xyz = xyz[:, ::stride][:, : self.nsample]

        grouped, knn_xyz = knn_group(sampled_xyz, xyz, features, self.k)
        emb = ConvBNReLU(self.out_channels, axis_name=self.axis_name, dtype=self.dtype)(grouped, train)
        c_o = self.out_channels[-1]

        q = nn.Dense(c_o // 4, use_bias=False, dtype=self.dtype)(emb)  # [B,M,k,C/4]
        k = nn.Dense(c_o // 4, use_bias=False, dtype=self.dtype)(emb)
        v = nn.Dense(c_o, use_bias=False, dtype=self.dtype)(emb)
        scores = jnp.einsum('bmkc,bmjc->bmkj', q, k,
                            preferred_element_type=jnp.float32) / (self.k ** 0.5)
        attn = jax.nn.softmax(scores, axis=-1)                # [B,M,k,k]
        attended = jnp.einsum('bmkj,bmjc->bmkc', attn.astype(v.dtype), v,
                              preferred_element_type=jnp.float32
                              ).astype(jnp.float32)           # [B,M,k,C]
        attentive_feature = jnp.sum(attended, axis=2)         # [B,M,C]

        # keypoints from column-summed attention over neighbours
        w_xyz = jnp.sum(attn, axis=2)                         # [B,M,k]
        keypoints = jnp.einsum('bmk,bmkc->bmc', w_xyz, knn_xyz)

        sigmas = MLPHead((c_o, c_o), 1, axis_name=self.axis_name, dtype=self.dtype)(attentive_feature, train)
        sigmas = jax.nn.softplus(sigmas)[..., 0] + 0.001
        return keypoints, sigmas, attentive_feature


class MultiHeadCrossAttention(nn.Module):
    """Cross attention src->dst (`conv2d/layers.py:151-195`)."""
    feature_dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, feats_left, feats_right):
        B, N, C = feats_left.shape
        H = self.num_heads
        d = C // H
        q = nn.Dense(C, use_bias=False)(feats_left).reshape(B, N, H, d)
        k = nn.Dense(C, use_bias=False)(feats_right).reshape(B, -1, H, d)
        v = nn.Dense(C, use_bias=False)(feats_right).reshape(B, -1, H, d)
        scores = jnp.einsum('bnhd,bmhd->bhnm', q, k) / (d ** 0.5)
        attn = jax.nn.softmax(scores, axis=-1)                # [B,H,N,M]
        out = jnp.einsum('bhnm,bmhd->bnhd', attn, v).reshape(B, N, C)
        return nn.Dense(C)(out), attn


def correspondence_estimator(dst_xyz, attn_scores, sigmas):
    """Attention-weighted correspondences (`conv2d/layers.py:197-235`):
    re-softmax the (head-wise) attention, average heads, weight dst points;
    confidence = max attention x sigma."""
    attn = jax.nn.softmax(attn_scores, axis=-1)               # [B,H,N,M]
    attn = jnp.mean(attn, axis=1)                             # [B,N,M]
    corres_xyz = jnp.einsum('bnm,bmc->bnc', attn, dst_xyz)
    corres_w = jnp.max(attn, axis=-1) * sigmas
    return corres_xyz, corres_w


class AttentionRegistrationModel(nn.Module):
    """Model_V5 coarse-to-fine pipeline (`conv2d/models.py:70-162`)."""
    cfg: ModelConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, src_points, dst_points, train: bool = False):
        cfg = self.cfg

        detectors = [
            KeypointDetectorSelfAttention(
                nsample=lvl.nsample, k=lvl.k, out_channels=lvl.conv_channels,
                use_fps=cfg.use_fps, axis_name=self.axis_name,
                dtype=(jnp.dtype(cfg.compute_dtype)
                       if cfg.compute_dtype != 'float32' else None),
                name=f'detector_{i + 1}')
            for i, lvl in enumerate(cfg.levels)]

        def extract(points):
            # the detector modules are shared between the two clouds (same
            # torch-module reuse as the reference's HierFeatureExtraction)
            ret = {}
            xyz, feat, weights = points, None, None
            for i, det in enumerate(detectors):
                xyz, sigmas, feat = det(xyz, feat, weights, train)
                ret[f'xyz_{i + 1}'] = xyz
                ret[f'sigmas_{i + 1}'] = sigmas
                ret[f'feat_{i + 1}'] = feat
                if cfg.use_weights:
                    w = 1.0 / (sigmas + 1e-5)
                    weights = w / jnp.mean(w, axis=1, keepdims=True)
                else:
                    weights = None
            return ret

        src = extract(src_points)
        dst = extract(dst_points)

        head = SVDHead(name='pose_head')
        dims = [lvl.conv_channels[-1] for lvl in cfg.levels]

        ret = {}
        # level 3
        ca3 = MultiHeadCrossAttention(dims[2], name='cross_attn_3')
        feats3, attn3 = ca3(src['feat_3'], dst['feat_3'])
        corres3, w3 = correspondence_estimator(dst['xyz_3'], attn3, src['sigmas_3'])
        R3, t3 = head(src['xyz_3'], corres3, w3)
        T3 = se3.pack(R3, t3)

        # level 2
        src_xyz_2t = se3.apply(R3, t3, src['xyz_2'])
        ca2 = MultiHeadCrossAttention(dims[1], name='cross_attn_2')
        feats2, attn2 = ca2(src['feat_2'], dst['feat_2'])
        corres2, w2 = correspondence_estimator(dst['xyz_2'], attn2, src['sigmas_2'])
        R2_, t2_ = head(src_xyz_2t, corres2, w2)
        T2 = se3.compose(se3.pack(R2_, t2_), T3)
        R2, t2 = se3.unpack(T2)

        # level 1
        src_xyz_1t = se3.apply(R2, t2, src['xyz_1'])
        ca1 = MultiHeadCrossAttention(dims[0], name='cross_attn_1')
        feats1, attn1 = ca1(src['feat_1'], dst['feat_1'])
        corres1, w1 = correspondence_estimator(dst['xyz_1'], attn1, src['sigmas_1'])
        R1_, t1_ = head(src_xyz_1t, corres1, w1)
        T1 = se3.compose(se3.pack(R1_, t1_), T2)
        R1, t1 = se3.unpack(T1)

        if cfg.mi_from_fine2:
            mi_feats = ConvBNReLU((dims[1],), axis_name=self.axis_name,
                                  name='mi_proj')(feats2, train)
            ret.update(mi_weights=w2, mi_weights_prime=jnp.roll(w2, 1, axis=0),
                       mi_feats=mi_feats,
                       mi_feats_prime=jnp.roll(mi_feats, 1, axis=0),
                       mi_c_local=src['feat_2'], mi_c_global=src['sigmas_2'])

        ret.update(
            rotation=[R3, R2, R1], translation=[t3, t2, t1],
            src_xyz_corres_3=corres3, src_xyz_corres_2=corres2, src_xyz_corres_1=corres1,
            src_dst_weights_3=w3, src_dst_weights_2=w2, src_dst_weights_1=w1,
            src_feats=src, dst_feats=dst,
            src_xyz_2_trans=src_xyz_2t, dst_xyz_2=dst['xyz_2'],
        )
        return ret
