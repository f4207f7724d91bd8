"""Training objective: model + configured loss combination as one module.

Replaces the loss-wiring bodies of the reference's 15 train scripts
(SURVEY.md §2.3; canonical skeleton `train/train_reg_v11.py:305-465`) with
one flax module so the whole step — forward, every loss, metrics — is a
single jitted apply.  The MI discriminators are submodules, so their
parameters live in the same optimizer exactly like the reference appends
``mi_loss.parameters()`` (`train_reg_v6.py:268`).

Semantics reproduced:
  * inputs src = uncalibed_pcd, dst = pcd_left; gt = inverse(igt)
    (`train_reg_v11.py:330-333`);
  * transformation loss averaged over the 3 pyramid layers
    (`train_reg_v11.py:371-384`), weighted by `loss.layer_weights`;
  * chamfer on (src_xyz_2_trans, dst_xyz_2) with scale 50
    (`train_reg_v6.py:328`, `losses/chamfer_loss.py:27`);
  * MI loss on the FineReg2/CoarseReg outputs (`train_reg_v6.py:331`);
  * overlap-circle on (coord_dist, feats_dist) (`train_reg_v9.py:318-349`);
  * `detach_transformation`: unsupervised variants stop gradients through
    the pose loss and keep it for metrics only (`train_reg_v8.py:144`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..geometry import se3
from ..losses import (DeepMILoss, chamfer_loss, overlap_circle_loss,
                      transformation_loss)
from ..models.registration import RegistrationModel


class RegistrationObjective(nn.Module):
    """Computes (total_loss, metrics, ret_dict) for a registration batch."""
    cfg: Config
    axis_name: Optional[str] = None

    def setup(self):
        if self.cfg.model.backbone == 'attention':
            from ..models.attention import AttentionRegistrationModel
            self.model = AttentionRegistrationModel(self.cfg.model,
                                                    axis_name=self.axis_name,
                                                    name='model')
        else:
            self.model = RegistrationModel(self.cfg.model, axis_name=self.axis_name,
                                           name='model')
        lc = self.cfg.loss
        if lc.mi:
            mcfg = self.cfg.model
            if mcfg.mi_from_coarse:
                lvl = mcfg.levels[2]
            else:
                lvl = mcfg.levels[1]
            self.mi_loss = DeepMILoss(
                global_in_channels=lc.mi_global_channels or lvl.nsample,
                local_in_channels=lc.mi_local_channels or lvl.desc_dim,
                name='mi_loss')

    def __call__(self, batch, train: bool = False):
        cfg = self.cfg
        src = batch['uncalibed_pcd']
        dst = batch['pcd_left']
        gt = se3.inverse(batch['igt'])
        gt_R, gt_t = se3.unpack(gt)

        ret = self.model(src, dst, train=train)

        metrics = {}
        total = jnp.asarray(0.0, jnp.float32)

        # --- transformation loss (3 layers) -------------------------------
        lw = jnp.asarray(cfg.loss.layer_weights, jnp.float32)
        tf_losses = []
        for i, (R, t) in enumerate(zip(ret['rotation'], ret['translation'])):
            out = transformation_loss(R, t, gt_R, gt_t, alpha=cfg.loss.alpha)
            tf_losses.append(out['loss'] * lw[i])
            if i == len(ret['rotation']) - 1:  # finest layer drives metrics
                metrics.update(
                    rot_err_x=out['rot_err'][0], rot_err_y=out['rot_err'][1],
                    rot_err_z=out['rot_err'][2],
                    trans_err_x=out['trans_err'][0], trans_err_y=out['trans_err'][1],
                    trans_err_z=out['trans_err'][2],
                    rre=jnp.mean(out['rre']), rte=jnp.mean(out['rte']),
                    loss_R=out['loss_R'], loss_t=out['loss_t'])
        tf_total = jnp.sum(jnp.stack(tf_losses)) / jnp.sum(lw)
        metrics['tf_loss'] = tf_total
        if cfg.loss.transformation and not cfg.loss.detach_transformation:
            total = total + tf_total

        # --- chamfer -------------------------------------------------------
        if cfg.loss.chamfer:
            ch = chamfer_loss(ret['src_xyz_2_trans'], ret['dst_xyz_2'],
                              scale=cfg.loss.chamfer_scale)
            metrics['chamfer_loss'] = ch
            total = total + ch

        # --- deep MI -------------------------------------------------------
        if cfg.loss.mi:
            if train and src.shape[0] < 2:
                # the "prime" negatives are a batch-roll (reference
                # torch.randperm(B), `model_v6/layers.py:495-504`): at B=1
                # both degenerate to pos==neg and the JSD bound is silently
                # zero-information.  Reference MI scripts default bs=16
                # (`train_reg_v6.py:40`).  TRAINING refuses at trace time;
                # eval/infer still run the module (its params are part of
                # the checkpoint tree and the pose metrics ignore its
                # degenerate-at-B=1 value).
                raise ValueError(
                    'MI loss needs batch_size >= 2: its negatives are a '
                    'batch permutation, degenerate at B=1')
            mi = self.mi_loss(
                x_global=ret['mi_weights'], x_global_prime=ret['mi_weights_prime'],
                x_local=ret['mi_feats'], x_local_prime=ret['mi_feats_prime'],
                c_local=ret['mi_c_local'], c_global=ret['mi_c_global'])
            metrics['mi_loss'] = mi
            total = total + mi

        # --- overlap circle ------------------------------------------------
        if cfg.loss.circle:
            circ = overlap_circle_loss(ret['coord_dist'], ret['feats_dist'])
            metrics['circle_loss'] = circ
            total = total + circ

        metrics['loss'] = total
        return total, metrics, ret
