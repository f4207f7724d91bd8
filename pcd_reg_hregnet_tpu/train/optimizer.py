"""Optimizer / LR-schedule factory with param groups and freezing.

Reproduces the reference recipes with optax:
  * AdamW with a lower LR for PTv3 "block" parameters and OneCycle
    scheduling with 8% warmup + grad-clip 1.0
    (`/root/reference/train/train_reg_v11.py:248-272,391`);
  * Adam + StepLR(10, 0.5) for feature pretraining
    (`train/train_feats.py:184-185`);
  * parameter freezing (`--freeze_detector` / `--freeze_feats`,
    `HRegNet/models.py:18-20,67-69`) via optax masking — the idiomatic JAX
    equivalent of `requires_grad = False`.
"""
from __future__ import annotations

from typing import Callable

import optax

from ..core.config import TrainConfig


def _path_has(path, *needles) -> bool:
    keys = [getattr(p, 'key', str(p)) for p in path]
    return any(any(n in str(k) for k in keys) for n in needles)


def make_schedule(cfg: TrainConfig, base_lr: float, steps_per_epoch: int):
    total = max(1, cfg.epochs * steps_per_epoch)
    if cfg.schedule == 'onecycle':
        return optax.cosine_onecycle_schedule(
            transition_steps=total, peak_value=base_lr, pct_start=cfg.warmup_pct)
    if cfg.schedule == 'cosine':
        return optax.cosine_decay_schedule(base_lr, total)
    if cfg.schedule == 'step':
        return optax.exponential_decay(
            base_lr, transition_steps=cfg.step_size * steps_per_epoch,
            decay_rate=cfg.step_gamma, staircase=True)
    if cfg.schedule == 'constant':
        return optax.constant_schedule(base_lr)
    raise ValueError(f'unknown schedule {cfg.schedule!r}')


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Build the full transform: clip -> param-group adamw -> freeze mask."""
    base_sched = make_schedule(cfg, cfg.lr, steps_per_epoch)
    block_sched = make_schedule(cfg, cfg.block_lr, steps_per_epoch)

    def opt_for(sched):
        if cfg.optimizer == 'adamw':
            return optax.adamw(sched, weight_decay=cfg.weight_decay)
        if cfg.optimizer == 'adam':
            return optax.adam(sched)
        if cfg.optimizer == 'sgd':
            return optax.sgd(sched, momentum=0.9)
        raise ValueError(f'unknown optimizer {cfg.optimizer!r}')

    def group_label(path, _) -> str:
        # PTv3 transformer blocks get the low "block" LR (train_reg_v11.py:248-262
        # separates params whose name contains 'block'); frozen groups zero out.
        if cfg.freeze_feats and _path_has(path, 'feature_extraction'):
            return 'frozen'
        if cfg.freeze_detector and _path_has(path, 'detector'):
            return 'frozen'
        if _path_has(path, 'ptv3', 'PTv3Block'):
            return 'block'
        return 'base'

    tx = optax.multi_transform(
        {'base': opt_for(base_sched), 'block': opt_for(block_sched),
         'frozen': optax.set_to_zero()},
        lambda params: __import__('jax').tree_util.tree_map_with_path(
            group_label, params))
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
