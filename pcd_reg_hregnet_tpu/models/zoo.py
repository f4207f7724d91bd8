"""Named model presets — the reference's model classes as configurations.

Maps every class exported by `/root/reference/models/__init__.py:1-9`
(HRegNet, Model_V1..Model_V6) onto `ModelConfig` presets over the single
`RegistrationModel`.  Semantics per variant (SURVEY.md §2.2):

* hregnet    — conv descriptors, SVD head (`models/HRegNet/models.py:60`)
* model_v1   — + MI outputs from CoarseReg (`models/model_v1/models.py:60`)
* model_v2   — + MI outputs from FineReg2 after coarse reg (**A1**,
               `models/model_v2/models.py`)
* model_v3   — V2 with MLP regression head (`models/model_v3/models.py:79-100`)
* model_v4   — V2 + overlap-circle dists from CoarseReg, SVD head
               (`models/model_v4/models.py:75,97`)
* model_v5   — attention detector/correspondence variant
               (`models/model_v5/conv2d/models.py`)
* model_v6   — PTv3 descriptor backbone (**A2**, `models/model_v6/models.py:122`)
"""
from __future__ import annotations

import dataclasses
from typing import Optional

from ..core.config import ModelConfig
from .registration import RegistrationModel


_PRESETS = {
    'hregnet': ModelConfig(name='hregnet'),
    'model_v1': ModelConfig(name='model_v1', mi_from_coarse=True),
    'model_v2': ModelConfig(name='model_v2', mi_from_fine2=True),
    'model_v3': ModelConfig(name='model_v3', mi_from_fine2=True, head='regression'),
    'model_v4': ModelConfig(name='model_v4', mi_from_fine2=True, circle_dists=True),
    'model_v5': ModelConfig(name='model_v5', backbone='attention', mi_from_fine2=True),
    'model_v6': ModelConfig(name='model_v6', backbone='ptv3',
                            mi_from_fine2=True, circle_dists=True),
}


def model_config(name: str, **overrides) -> ModelConfig:
    """Get the preset ModelConfig for a reference model name."""
    if name not in _PRESETS:
        raise KeyError(f'unknown model {name!r}; available: {sorted(_PRESETS)}')
    cfg = _PRESETS[name]
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def build(name: str, axis_name: Optional[str] = None, **overrides):
    """Build the model for a named preset (Model_V5 uses the attention
    pipeline; everything else the unified RegistrationModel)."""
    cfg = model_config(name, **overrides)
    if cfg.backbone == 'attention':
        from .attention import AttentionRegistrationModel
        return AttentionRegistrationModel(cfg, axis_name=axis_name)
    return RegistrationModel(cfg, axis_name=axis_name)


def available() -> list[str]:
    return sorted(_PRESETS)
