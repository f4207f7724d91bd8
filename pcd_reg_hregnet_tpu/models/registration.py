"""Hierarchical coarse-to-fine registration network (HRegNet family).

One configurable flax module replaces the reference's seven copy-pasted
model classes (`/root/reference/models/__init__.py:1-9`; HRegNet
`models/HRegNet/models.py:60-148`, Model_V1..V6 under `models/model_v*/`).
Named presets live in `models/zoo.py`.

Conventions (all channels-last):
  src/dst points [B, N, 3]; descriptors [B, M, C]; the network returns a
  dict with `rotation` = [R3, R2, R1] and `translation` = [t3, t2, t1]
  (coarse -> fine, composed), same contract as the reference
  (`HRegNet/models.py:141-142`), plus the variant-specific loss tensors.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..core.config import ModelConfig
from ..geometry import se3
from .layers import (CoarseReg, DescExtractor, FineReg, KeypointDetector,
                     RegressionHead, Regression6DHead, SVDHead)
from .ptv3 import PointTransformerEncoder


class HierFeatureExtraction(nn.Module):
    """3-level keypoint + descriptor pyramid.

    Re-designs `HierFeatureExtraction` (`HRegNet/models.py:7-58`; PTv3
    variant `model_v6/models.py:7-119`): level-(i+1) WFPS weights are the
    mean-normalised inverse sigmas of level i.
    """
    cfg: ModelConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, points, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype != 'float32' else None
        ret = {}
        xyz, feat, weights = points, None, None
        for i, lvl in enumerate(cfg.levels):
            det = KeypointDetector(
                nsample=lvl.nsample, k=lvl.k, out_channels=lvl.conv_channels,
                use_fps=cfg.use_fps, axis_name=self.axis_name,
                dtype=dtype, name=f'detector_{i + 1}')
            xyz, sigmas, att_feat, grouped, att_map = det(xyz, feat, weights, train)

            if cfg.backbone == 'ptv3':
                enc = PointTransformerEncoder(
                    channels=lvl.desc_dim, depths=cfg.ptv3_depths,
                    num_heads=cfg.ptv3_num_heads,
                    patch_size=cfg.ptv3_patch_sizes[i],
                    mlp_ratio=cfg.ptv3_mlp_ratio, grid_size=cfg.ptv3_grid_size,
                    cpe=cfg.ptv3_cpe, seq_axis=cfg.seq_axis,
                    axis_name=self.axis_name, dtype=dtype, name=f'ptv3_{i + 1}')
                desc = enc(xyz, att_feat, train)
            else:
                ext = DescExtractor(out_channels=lvl.conv_channels,
                                    desc_dim=lvl.desc_dim,
                                    axis_name=self.axis_name, dtype=dtype,
                                    name=f'desc_extractor_{i + 1}')
                desc = ext(grouped, att_map, train)

            ret[f'xyz_{i + 1}'] = xyz
            ret[f'sigmas_{i + 1}'] = sigmas
            ret[f'desc_{i + 1}'] = desc

            feat = att_feat
            if cfg.use_weights:
                w = 1.0 / (sigmas + 1e-5)
                weights = w / jnp.mean(w, axis=1, keepdims=True)
            else:
                weights = None
        return ret


class RegistrationModel(nn.Module):
    """Coarse-to-fine registration: CoarseReg@L3 -> pose -> FineReg@L2 ->
    pose -> FineReg@L1 -> pose, composing transforms at each level."""
    cfg: ModelConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, src_points, dst_points, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype != 'float32' else None
        feat_net = HierFeatureExtraction(cfg, axis_name=self.axis_name,
                                         name='feature_extraction')
        fuse = cfg.fuse_towers_train if train else cfg.fuse_towers_eval
        if not fuse:
            # two tower calls: BatchNorm batch statistics are computed per
            # cloud, matching the reference's sequential forward passes
            # (`model_v6/models.py:141-142`).  `fuse_towers_train=True`
            # opts into the fused path below for training too (joint BN
            # stats over both clouds — documented deviation).
            src = feat_net(src_points, train)
            dst = feat_net(dst_points, train)
        else:
            # ONE fused 2B-batch tower call.  Bit-identical in eval (BN
            # uses running stats, every other op is per-example) but
            # measured SLOWER than two calls on v5e — 81 vs 312 pairs/s at
            # f32/B=8 with identical XLA-counted FLOPs: the downstream
            # consumers of the [:B]/[B:] slices hit a fusion/layout
            # pathology (results/bench_regression_r5.md).  Opt-in knob.
            B = src_points.shape[0]
            both = feat_net(
                jnp.concatenate([src_points, dst_points], axis=0), train)
            src = {k: v[:B] for k, v in both.items()}
            dst = {k: v[B:] for k, v in both.items()}

        c3 = cfg.levels[2].desc_dim
        coarse = CoarseReg(k=cfg.coarse_k, in_channels=c3,
                           use_sim=cfg.use_sim, use_neighbor=cfg.use_neighbor,
                           return_dists=cfg.circle_dists,
                           mi_outputs=cfg.mi_from_coarse, dtype=dtype,
                           axis_name=self.axis_name, name='coarse_corres')

        if cfg.head == 'regression':
            head = RegressionHead(name='pose_head')
        elif cfg.head == 'regression6d':
            head = Regression6DHead(name='pose_head')
        else:
            head = SVDHead(name='pose_head')

        ret = {}
        out3 = coarse(src['xyz_3'], src['desc_3'], dst['xyz_3'], dst['desc_3'],
                      src['sigmas_3'], dst['sigmas_3'], train)
        if cfg.mi_from_coarse:
            corres3, w3, w3_prime, mi_feats3, mi_feats3_prime = out3
            ret.update(mi_weights=w3, mi_weights_prime=w3_prime,
                       mi_feats=mi_feats3, mi_feats_prime=mi_feats3_prime,
                       mi_c_local=src['desc_3'], mi_c_global=src['sigmas_3'])
        elif cfg.circle_dists:
            corres3, w3, coord_dist, feats_dist = out3
            ret.update(coord_dist=coord_dist, feats_dist=feats_dist)
        else:
            corres3, w3 = out3

        R3, t3 = head(src['xyz_3'], corres3, w3)
        T3 = se3.pack(R3, t3)

        # Level 2
        src_xyz_2t = se3.apply(R3, t3, src['xyz_2'])
        fine2 = FineReg(k=cfg.fine_k, in_channels=cfg.levels[1].desc_dim,
                        mi_outputs=cfg.mi_from_fine2, dtype=dtype,
                        axis_name=self.axis_name, name='fine_corres_2')
        out2 = fine2(src_xyz_2t, src['desc_2'], dst['xyz_2'], dst['desc_2'],
                     src['sigmas_2'], dst['sigmas_2'], train)
        if cfg.mi_from_fine2:
            corres2, w2, w2_prime, mi_feats2, mi_feats2_prime = out2
            ret.update(mi_weights=w2, mi_weights_prime=w2_prime,
                       mi_feats=mi_feats2, mi_feats_prime=mi_feats2_prime,
                       mi_c_local=src['desc_2'], mi_c_global=src['sigmas_2'])
        else:
            corres2, w2 = out2
        R2_, t2_ = head(src_xyz_2t, corres2, w2)
        T2 = se3.compose(se3.pack(R2_, t2_), T3)
        R2, t2 = se3.unpack(T2)

        # Level 1
        src_xyz_1t = se3.apply(R2, t2, src['xyz_1'])
        fine1 = FineReg(k=cfg.fine_k, in_channels=cfg.levels[0].desc_dim,
                        dtype=dtype,
                        axis_name=self.axis_name, name='fine_corres_1')
        corres1, w1 = fine1(src_xyz_1t, src['desc_1'], dst['xyz_1'], dst['desc_1'],
                            src['sigmas_1'], dst['sigmas_1'], train)
        R1_, t1_ = head(src_xyz_1t, corres1, w1)
        T1 = se3.compose(se3.pack(R1_, t1_), T2)
        R1, t1 = se3.unpack(T1)

        ret.update(
            rotation=[R3, R2, R1],
            translation=[t3, t2, t1],
            src_xyz_corres_3=corres3, src_xyz_corres_2=corres2, src_xyz_corres_1=corres1,
            src_dst_weights_3=w3, src_dst_weights_2=w2, src_dst_weights_1=w1,
            src_feats=src, dst_feats=dst,
            # chamfer-loss pair (`model_v6/models.py:244-245`)
            src_xyz_2_trans=src_xyz_2t, dst_xyz_2=dst['xyz_2'],
        )
        return ret
