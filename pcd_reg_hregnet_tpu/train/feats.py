"""Feature pretraining: detector stage then descriptor stage.

Re-designs `/root/reference/train/train_feats.py:153-290` and its shell
drivers (`scripts/train_man_keypt_detector.sh`, `train_man_descriptor.sh`):

  stage 1 (detector):   prob-chamfer loss over the 3 pyramid levels on
                        both clouds after the GT transform;
  stage 2 (descriptor): + matching loss per level, detector frozen
                        (`--train_desc --freeze_detector`).

The backbone is the same `HierFeatureExtraction` used by the registration
models, so pretrained parameters warm-start registration training exactly
like the reference's `--pretrain_backbone_feats` (`train_reg_v11.py:230`,
strict=False ~ params subtree merge here).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..core.config import Config
from ..geometry import se3
from ..losses import matching_loss, prob_chamfer_loss
from ..models.registration import HierFeatureExtraction
from ..parallel.mesh import batch_sharding, replicated
from .loop import TrainState
from .optimizer import make_optimizer


class FeatsObjective(nn.Module):
    """Detector / descriptor pretraining objective (train_feats.py:59-78)."""
    cfg: Config
    train_desc: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        net = HierFeatureExtraction(self.cfg.model, axis_name=self.axis_name,
                                    name='feature_extraction')
        src = batch['uncalibed_pcd']
        dst = batch['pcd_left']
        gt_R, gt_t = se3.unpack(se3.inverse(batch['igt']))

        ret_src = net(src, train=train)
        ret_dst = net(dst, train=train)

        metrics = {}
        total = jnp.asarray(0.0, jnp.float32)
        for lvl in (1, 2, 3):
            c = prob_chamfer_loss(ret_src[f'xyz_{lvl}'], ret_dst[f'xyz_{lvl}'],
                                  ret_src[f'sigmas_{lvl}'], ret_dst[f'sigmas_{lvl}'],
                                  gt_R, gt_t)
            metrics[f'chamfer_l{lvl}'] = c
            total = total + c
            if self.train_desc:
                m = matching_loss(ret_src[f'xyz_{lvl}'], ret_src[f'sigmas_{lvl}'],
                                  ret_src[f'desc_{lvl}'],
                                  ret_dst[f'xyz_{lvl}'], ret_dst[f'sigmas_{lvl}'],
                                  ret_dst[f'desc_{lvl}'], gt_R, gt_t)
                metrics[f'matching_l{lvl}'] = m
                total = total + m
        metrics['loss'] = total
        return total, metrics, (ret_src, ret_dst)


def create_feats_state(cfg: Config, objective: FeatsObjective, sample_batch,
                       steps_per_epoch: int):
    key = jax.random.PRNGKey(cfg.train.seed)
    variables = jax.jit(partial(objective.init, train=False))(
        key, jax.tree.map(jnp.asarray, sample_batch))
    tx = make_optimizer(cfg.train, steps_per_epoch)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables['params'],
                       batch_stats=variables.get('batch_stats', {}),
                       opt_state=tx.init(variables['params']))
    return state, tx


def make_feats_train_step(objective: FeatsObjective, tx, mesh):
    def step_fn(state: TrainState, batch):
        def loss_fn(params):
            (loss, metrics, _), mutated = objective.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, train=True, mutable=['batch_stats'])
            return loss, (metrics, mutated.get('batch_stats', state.batch_stats))

        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt), metrics

    rep, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(step_fn, donate_argnums=(0,),
                   in_shardings=(rep, bsh), out_shardings=(rep, rep))


def transplant_backbone(feats_params: Any, model_params: Any) -> Any:
    """Copy the pretrained `feature_extraction` subtree into a registration
    model's params — the warm start `load_state_dict(strict=False)` performs
    in the reference (`train_reg_v11.py:230`)."""
    if 'feature_extraction' not in feats_params:
        raise KeyError('pretrained params have no feature_extraction subtree')
    out = dict(model_params)
    target = out.get('model', out)
    if 'feature_extraction' not in target:
        raise KeyError('target params have no feature_extraction subtree')
    if 'model' in out:
        inner = dict(out['model'])
        inner['feature_extraction'] = feats_params['feature_extraction']
        out['model'] = inner
    else:
        out['feature_extraction'] = feats_params['feature_extraction']
    return out
