"""Feature-pretraining loop: detector stage, descriptor stage.

Drives `train/feats.py` objectives the way the reference's
`train_feats.py:153-290` + shell scripts do:

  stage 'detector':   prob-chamfer only (fresh backbone);
  stage 'descriptor': + matching loss, detector frozen, warm-started from
                      the detector stage via `transplant_backbone`-style
                      subtree copy (`--pretrain_detector`).
"""
from __future__ import annotations

import math
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..data import batch_iterator, load_dataset
from ..parallel.mesh import make_mesh, shard_batch
from ..utils.logging import MetricLogger
from .feats import FeatsObjective, create_feats_state, make_feats_train_step
from .loop import TrainState, restore_params, save_checkpoint


def fit_feats(cfg: Config, *, stage: str = 'detector',
              pretrain_detector: Optional[str] = None,
              log_dir: str = 'runs_feats', max_steps: Optional[int] = None,
              datasets=None) -> tuple[TrainState, Dict[str, float]]:
    """Train the feature pyramid; returns (state, last metrics)."""
    assert stage in ('detector', 'descriptor')
    train_ds = datasets[0] if datasets else load_dataset(cfg.data, 'train')

    bs = cfg.data.batch_size
    mesh = make_mesh(math.gcd(len(jax.devices()), bs), cfg.mesh.data_axis)
    objective = FeatsObjective(cfg, train_desc=(stage == 'descriptor'))
    steps_per_epoch = max(1, len(train_ds) // bs)

    sample = next(batch_iterator(train_ds, bs))
    state, tx = create_feats_state(cfg, objective, sample, steps_per_epoch)
    if pretrain_detector:
        # params-only: the detector stage used a different freeze config, so
        # its opt_state tree does not match this stage's optimizer
        state = restore_params(pretrain_detector, state)
    # Preemption/stall recovery: the stage checkpoint (written every
    # epoch) restores IN FULL — params + opt_state + epoch — so a killed
    # attempt continues instead of restarting the whole stage (the train
    # loop got this in r2; feats stages relied on "short schedules" until
    # a 50-epoch protocol run met a tunnel stall at epoch 31).
    start_epoch = 0
    stage_ckpt = os.path.abspath(
        os.path.join(log_dir, cfg.train.ckpt_dir, f'feats_{stage}'))
    meta_path = os.path.join(stage_ckpt, 'meta.json')
    if os.path.exists(meta_path):
        from .loop import restore_checkpoint
        state = restore_checkpoint(stage_ckpt, state)
        import json
        with open(meta_path) as f:
            start_epoch = min(json.load(f)['epoch'] + 1, cfg.train.epochs)
        print(f'[resume] feats_{stage} checkpoint found -> '
              f'continuing at epoch {start_epoch}/{cfg.train.epochs}')
    step = make_feats_train_step(objective, tx, mesh)

    logger = MetricLogger(log_dir, cfg,
                          trim_from_epoch=start_epoch if start_epoch else None)
    metrics: Dict[str, float] = {}
    total = 0
    fetcher = None            # dtype-packed host fetch (see loop.TreeFetcher)
    for epoch in range(start_epoch, cfg.train.epochs):
        t0 = time.time()
        if hasattr(train_ds, 'set_epoch'):
            train_ds.set_epoch(epoch)
        keys, sum_vec, count = None, None, 0
        for batch in batch_iterator(train_ds, bs, shuffle=True,
                                    seed=cfg.train.seed, epoch=epoch):
            state, m = step(state, shard_batch(batch, mesh))
            count += 1
            # accumulate ON DEVICE as one stacked vector; single readback
            # per epoch (per-step readbacks stall the tunnel; per-metric
            # scalar ops leak host memory — see run_epoch)
            if keys is None:
                keys = sorted(m)
            vec = jnp.stack([jnp.mean(m[k]) for k in keys])
            sum_vec = vec if sum_vec is None else sum_vec + vec
        totals = np.asarray(sum_vec)
        metrics = {k: float(totals[i]) / count for i, k in enumerate(keys)}
        logger.log_epoch(epoch, metrics, {}, seconds=time.time() - t0)
        total += count
        state_dict = {'params': state.params, 'batch_stats': state.batch_stats,
                      'opt_state': state.opt_state, 'step': state.step}
        if fetcher is None:
            from .loop import TreeFetcher
            fetcher = TreeFetcher(state_dict)
        save_checkpoint(os.path.join(log_dir, cfg.train.ckpt_dir),
                        f'feats_{stage}', fetcher(state_dict), cfg, epoch)
        if max_steps is not None and total >= max_steps:
            break
    logger.close()
    return state, metrics
