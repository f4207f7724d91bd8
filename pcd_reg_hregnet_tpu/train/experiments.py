"""Named experiment presets — the reference's 15-script matrix as data.

Each entry reproduces one reference train script's (model, head, loss,
optimizer) combination (SURVEY.md §2.3 table; citations below are the
script headers + loss instantiation lines).  `experiment(name)` returns a
full `Config`; pass overrides for dataset/batch/epochs.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

from ..core.config import Config, DataConfig, LossConfig, TrainConfig
from ..models.zoo import model_config


def _cfg(model_name: str, loss: LossConfig, train: TrainConfig = TrainConfig(),
         **model_overrides) -> Config:
    return Config(model=model_config(model_name, **model_overrides),
                  loss=loss, train=train, data=DataConfig())


_V11_TRAIN = TrainConfig(optimizer='adamw', schedule='onecycle', lr=1e-4,
                         block_lr=1e-5, weight_decay=5e-5, grad_clip=1.0)
_LEGACY_TRAIN = TrainConfig(optimizer='adam', schedule='step', lr=1e-3,
                            step_size=10, step_gamma=0.5)

_EXPERIMENTS: Dict[str, Config] = {
    # train_reg_v0.py:1-4,241 — HRegNet, SVD, Tf only
    'reg_v0': _cfg('hregnet', LossConfig()),
    # train_reg_v1.py:1-4,175 — HRegNet, Regression head, Tf
    'reg_v1': _cfg('hregnet', LossConfig(), head='regression'),
    # train_reg_v2.py:1-5,196 — Model_V1, SVD, Ch+MI (unsupervised)
    'reg_v2': _cfg('model_v1', LossConfig(transformation=False, chamfer=True,
                                          mi=True, detach_transformation=True)),
    # train_reg_v3.py:1-4,179 — HRegNet, SVD, Tf+Ch
    'reg_v3': _cfg('hregnet', LossConfig(chamfer=True)),
    # train_reg_v4.py:1-4,186 — Model_V1, SVD, Tf+MI
    'reg_v4': _cfg('model_v1', LossConfig(mi=True)),
    # train_reg_v5.py:1-4,212 — Model_V1, SVD, Tf+Ch+MI
    'reg_v5': _cfg('model_v1', LossConfig(chamfer=True, mi=True)),
    # train_reg_v6.py:1-4,248 — Model_V2 (**A1**), SVD, Tf+Ch+MI
    'reg_v6': _cfg('model_v2', LossConfig(chamfer=True, mi=True)),
    # train_reg_v7.py:1-4,218 — Model_V3, Regression, Tf+Ch+MI
    'reg_v7': _cfg('model_v3', LossConfig(chamfer=True, mi=True)),
    # train_reg_v8.py:1-4,231 — Model_V2, SVD, Ch+MI (unsup; Tf detached :144)
    'reg_v8': _cfg('model_v2', LossConfig(transformation=False, chamfer=True,
                                          mi=True, detach_transformation=True)),
    # train_reg_v9.py:1-4,231-236 — Model_V4, SVD, Overlap+MI (Tf detached)
    'reg_v9': _cfg('model_v4', LossConfig(transformation=False, circle=True,
                                          mi=True, detach_transformation=True)),
    # train_reg_v10.py:1-4,218 — Model_V5, SVD, Tf+Ch+MI
    'reg_v10': _cfg('model_v5', LossConfig(chamfer=True, mi=True)),
    # train_reg_v11.py:1-4,222 — Model_V6 (**A2**), SVD, Tf only; AdamW +
    # per-group LR + OneCycle + grad-clip (the active registration recipe)
    'reg_v11': _cfg('model_v6', LossConfig(), _V11_TRAIN),
    # train_reg_v12.py:1-4,220 — Model_V6, SVD, Tf+Ch+MI
    'reg_v12': _cfg('model_v6', LossConfig(chamfer=True, mi=True), _V11_TRAIN),
    # train_reg_v13.py:1-3,216 — Model_V6, SVD, Ch+MI (unsup, Tf detached :142)
    'reg_v13': _cfg('model_v6', LossConfig(transformation=False, chamfer=True,
                                           mi=True, detach_transformation=True),
                    _V11_TRAIN),
    # scripts/train_man_registration.sh -> train_reg_v11 (the A2 headline run)
    'man_registration': _cfg('model_v6', LossConfig(), _V11_TRAIN),
    # baseline HRegNet headline run (README.md:150-156)
    'baseline': _cfg('hregnet', LossConfig(), _V11_TRAIN),
    # train_feats.py detector stage (prob-chamfer only; Adam 1e-3,
    # StepLR(10, 0.5), bs 16 — scripts/train_man_keypt_detector.sh,
    # train/train_feats.py:59-78,184-185); drive via
    # `pretrain-feats --stage detector`
    'feats': dataclasses.replace(
        _cfg('hregnet', LossConfig(), _LEGACY_TRAIN),
        data=DataConfig(batch_size=16)),
    # train_feats.py --train_desc descriptor stage (+ matching loss,
    # detector frozen, bs 8 — scripts/train_man_descriptor.sh)
    'feats_desc': dataclasses.replace(
        _cfg('hregnet', LossConfig(), dataclasses.replace(
            _LEGACY_TRAIN, freeze_detector=True)),
        data=DataConfig(batch_size=8)),
}


def experiment(name: str, **overrides) -> Config:
    """Get a named experiment Config; overrides replace top-level fields."""
    if name not in _EXPERIMENTS:
        raise KeyError(f'unknown experiment {name!r}; available: {sorted(_EXPERIMENTS)}')
    cfg = _EXPERIMENTS[name]
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def available() -> list[str]:
    return sorted(_EXPERIMENTS)
