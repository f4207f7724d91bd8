"""Hierarchical dataclass configuration for the whole framework.

Replaces the reference's three-way config split (argparse per train script
`train/train_reg_v11.py:42-68`, per-dataset JSON `dataset/config.json`
wrapped by `config.py:4-40`, and hard-coded hyperparameters scattered in
code) with one typed tree.  Every named experiment of the reference's
15-script matrix (SURVEY.md §2.3) is a preset over this tree in
`train/experiments.py`.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class LevelConfig:
    """One pyramid level of the hierarchical detector."""
    nsample: int
    k: int
    conv_channels: Tuple[int, ...]
    desc_dim: int


@dataclass(frozen=True)
class ModelConfig:
    """Registration network configuration.

    The reference's seven model classes (HRegNet, Model_V1..V6 —
    `models/__init__.py:1-9`) are points in this space; see
    `models/zoo.py` for the named presets.
    """
    name: str = 'hregnet'
    backbone: str = 'conv'            # 'conv' (DescExtractor) | 'ptv3' | 'attention' (V5)
    head: str = 'svd'                 # 'svd' | 'regression' | 'regression6d'
    use_fps: bool = True
    use_weights: bool = True
    # MI estimator inputs produced by the network:
    mi_from_coarse: bool = False      # Model_V1: CoarseReg emits mlpx feats + rolled primes
    mi_from_fine2: bool = False       # Model_V2/V6 (A1/A2): FineReg2 emits them
    # Overlap-circle-loss inputs (coord/feats dists from CoarseReg): Model_V4/V6
    circle_dists: bool = False
    coarse_k: int = 8
    fine_k: int = 8
    use_sim: bool = True
    use_neighbor: bool = True
    levels: Tuple[LevelConfig, ...] = (
        LevelConfig(1024, 64, (32, 32, 64), 64),
        LevelConfig(512, 32, (64, 64, 128), 128),
        LevelConfig(256, 16, (128, 128, 256), 256),
    )
    # PTv3 backbone (Model_V6 / A2) — `models/model_v6/models.py:29-49`
    ptv3_depths: Tuple[int, ...] = (2, 2, 2)
    ptv3_num_heads: Tuple[int, ...] = (2, 4, 8)
    ptv3_patch_sizes: Tuple[int, ...] = (256, 128, 64)  # per pyramid level
    ptv3_grid_size: float = 0.01
    ptv3_mlp_ratio: float = 4.0
    # CPE operator: 'knn' (3D continuous conv — the sparse-conv
    # equivalent), 'curve' (serialized depthwise conv), 'none'
    ptv3_cpe: str = 'knn'
    # dtype of the compute path ('bfloat16' activations are the TPU default)
    compute_dtype: str = 'float32'
    # Sequence parallelism (SURVEY.md §5.7): when set (e.g. 'seq'), the
    # PTv3 encoders constrain their serialized activations to shard on
    # this mesh axis — activated by `evaluate(..., seq_parallel=N)` /
    # `--seq-parallel N`, which enter `parallel.sequence.sequence_mesh`.
    seq_axis: Optional[str] = None
    # Run the src/dst feature towers as ONE 2B-batch call in TRAIN mode
    # too (eval always fuses — bit-identical there).  Saves the second
    # sequential FPS/kNN chain per step; deviation: BatchNorm batch
    # statistics are then computed jointly over both clouds instead of
    # per cloud (the reference runs two sequential forwards).
    fuse_towers_train: bool = False
    # Fuse the towers in EVAL mode (bit-identical there: eval BatchNorm
    # uses running stats, every other op is per-example).  Default OFF:
    # the r5 A/B (results/ab_bench_r5.json, results/bench_regression_r5.md)
    # measured the fused program at 81 pairs/s vs 312 unfused at f32/B=8 —
    # identical XLA-counted FLOPs, but the downstream consumers of the
    # [:B]/[B:] slices compile ~26x slower (fusion/layout pathology), and
    # even tower-only the two-call form is faster (43.8/s vs 37.7/s).
    fuse_towers_eval: bool = False


@dataclass(frozen=True)
class DataConfig:
    """Dataset / decalibration protocol (reference `dataset/config.json`)."""
    dataset: str = 'synthetic'        # 'man' | 'audi' | 'synthetic'
    path: str = ''
    version: str = 'v1.0-mini'
    mode: str = 'L2L'
    lidar_tokens: Tuple[str, str] = ('LIDAR_LEFT', 'LIDAR_RIGHT')
    pcd_min_samples: int = 8096
    max_range: float = 80.0
    max_rot_error: float = 20.0       # degrees
    max_trans_error: float = 0.5      # metres
    distribution: str = 'uniform'
    mag_randomly: bool = True
    max_intensity: float = 1.0
    batch_size: int = 1
    num_workers: int = 6
    limscenes: Optional[int] = None
    # Official scene-split lists as JSON {split: [scene names]} — the
    # devkit's create_splits_scenes() serialised (`man_dataset.py:174-232`).
    # Empty: auto-discover <path>/<version>/splits.json or <path>/splits.json,
    # else fall back to a deterministic hash split with `split_ratios`.
    splits_file: str = ''
    # A2D2 ratio split (`dataset/audi_dataset.py:337-351`); also the
    # TruckScenes hash-split fallback ratios
    split_ratios: Tuple[float, float, float] = (0.6, 0.3, 0.1)


@dataclass(frozen=True)
class LossConfig:
    """Loss combination — the reference encodes this in which train script
    you run (SURVEY.md §2.3); here it's data."""
    transformation: bool = True
    # Tf-loss rotation weight — reference default (`train_reg_v11.py:66`,
    # `dataset/config.json` loss_weights[0]); every reference script uses 1.0.
    alpha: float = 1.0
    chamfer: bool = False
    chamfer_scale: float = 50.0
    mi: bool = False
    mi_local_channels: Optional[int] = None
    mi_global_channels: Optional[int] = None
    circle: bool = False
    detach_transformation: bool = False  # unsupervised variants log Tf metrics only
    layer_weights: Tuple[float, float, float] = (1.0, 1.0, 1.0)


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 100
    lr: float = 1e-4
    block_lr: float = 1e-5            # PTv3-block param-group LR (train_reg_v11.py:248-262)
    weight_decay: float = 5e-5
    optimizer: str = 'adamw'
    schedule: str = 'onecycle'        # 'onecycle' | 'step' | 'cosine' | 'constant'
    warmup_pct: float = 0.08
    step_size: int = 10               # StepLR params (train_feats.py:185)
    step_gamma: float = 0.5
    grad_clip: float = 1.0
    seed: int = 1
    freeze_detector: bool = False
    freeze_feats: bool = False
    val_every: int = 1
    # wandb.watch equivalent (`train_reg_v11.py:235-236`): log per-module
    # gradient/parameter norms each epoch (CSV + wandb)
    watch: bool = False
    ckpt_dir: str = 'ckpt'
    use_wandb: bool = False
    runname: str = ''


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / parallelism axes (new vs. the single-GPU reference)."""
    data_axis: str = 'data'
    data_parallel: int = -1           # -1: all devices
    donate_state: bool = True


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw) -> 'Config':
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @staticmethod
    def from_json(s: str) -> 'Config':
        raw = json.loads(s)

        def build(cls, d):
            kwargs = {}
            for f in dataclasses.fields(cls):
                if f.name not in d:
                    continue
                v = d[f.name]
                if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
                    v = build(f.type, v)
                kwargs[f.name] = v
            return cls(**kwargs)

        cfg = Config(
            model=_build_model(raw.get('model', {})),
            data=DataConfig(**_tupled(raw.get('data', {}), ('lidar_tokens', 'split_ratios'))),
            loss=LossConfig(**_tupled(raw.get('loss', {}), ('layer_weights',))),
            train=TrainConfig(**raw.get('train', {})),
            mesh=MeshConfig(**raw.get('mesh', {})),
        )
        return cfg


def _tupled(d: dict, keys: Sequence[str]) -> dict:
    d = dict(d)
    for k in keys:
        if k in d and isinstance(d[k], list):
            d[k] = tuple(d[k])
    return d


def _build_model(d: dict) -> ModelConfig:
    d = _tupled(d, ('ptv3_depths', 'ptv3_num_heads', 'ptv3_patch_sizes'))
    if 'levels' in d:
        d['levels'] = tuple(
            LevelConfig(nsample=l['nsample'], k=l['k'],
                        conv_channels=tuple(l['conv_channels']), desc_dim=l['desc_dim'])
            for l in d['levels'])
    return ModelConfig(**d)
