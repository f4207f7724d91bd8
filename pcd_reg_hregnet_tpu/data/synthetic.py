"""Synthetic LiDAR scene generator — registration pairs without real data.

The reference has no synthetic data path (it requires the MAN TruckScenes
download); this framework adds one so the full training/eval/benchmark
pipeline runs hermetically (tests, CI, benchmarks) and so kernels can be
exercised at the production point counts.

A scene is a ground plane + random boxes ("buildings/vehicles") + pole-like
vertical structures, ray-sampled with per-sensor viewpoints and dropout so
the two "LiDAR" views see overlapping-but-different point sets — the same
structure as a TruckScenes LIDAR_LEFT/LIDAR_RIGHT pair after extrinsic
alignment (`/root/reference/dataset/man_dataset.py:108-134`).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


class SyntheticPairSource:
    """Deterministic synthetic pair source for `pipeline.PairDataset`."""

    def __init__(self, length: int = 64, points_per_cloud: int = 16384,
                 extent: float = 60.0, seed: int = 0):
        self.length = length
        self.points_per_cloud = points_per_cloud
        self.extent = extent
        self.seed = seed
        # pairs are deterministic in (seed, index) — cache them so epochs
        # beyond the first don't pay scene generation again (the fresh
        # per-epoch decalibration happens downstream in PairDataset)
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}

    def __len__(self) -> int:
        return self.length

    def _scene_points(self, rng: np.random.Generator, n: int) -> np.ndarray:
        ext = self.extent
        n_ground = n // 3
        n_struct = n - n_ground

        # ground plane with gentle undulation
        g_xy = rng.uniform(-ext, ext, size=(n_ground, 2))
        g_z = 0.05 * np.sin(0.1 * g_xy[:, 0]) * np.cos(0.13 * g_xy[:, 1]) \
            + rng.normal(0, 0.02, n_ground)
        ground = np.column_stack([g_xy, g_z])

        # boxes: sample points on the surfaces of ~24 random boxes
        boxes = []
        n_boxes = 24
        per_box = n_struct // n_boxes
        for _ in range(n_boxes):
            center = rng.uniform(-ext, ext, size=2)
            size = rng.uniform(1.0, 10.0, size=2)
            height = rng.uniform(1.5, 12.0)
            face = rng.integers(0, 4, size=per_box)
            u = rng.uniform(-0.5, 0.5, size=per_box)
            z = rng.uniform(0.0, height, size=per_box)
            x = np.where(face == 0, -0.5, np.where(face == 1, 0.5, u)) * size[0]
            y = np.where(face == 2, -0.5, np.where(face == 3, 0.5, u)) * size[1]
            boxes.append(np.column_stack([center[0] + x, center[1] + y, z]))
        pts = np.concatenate([ground] + boxes, axis=0)
        return pts[: n].astype(np.float32)

    def load_pair(self, index: int) -> Dict[str, np.ndarray]:
        if index in self._cache:
            # deep-copy the arrays: consumers may mutate in place, and an
            # aliased cache would corrupt every later epoch's view
            return {k: (v.copy() if isinstance(v, np.ndarray) else v)
                    for k, v in self._cache[index].items()}
        rng = np.random.default_rng((self.seed, index))
        n = self.points_per_cloud
        scene = self._scene_points(rng, int(n * 1.5))

        # two sensors see random overlapping subsets with independent noise
        def view(sub_rng):
            idx = sub_rng.choice(len(scene), n, replace=False)
            pts = scene[idx] + sub_rng.normal(0, 0.01, (n, 3)).astype(np.float32)
            inten = sub_rng.uniform(0, 1, n).astype(np.float32)
            return pts, inten

        left, int_l = view(np.random.default_rng((self.seed, index, 1)))
        right, int_r = view(np.random.default_rng((self.seed, index, 2)))
        pair = dict(pcd_left=left, pcd_right=right,
                    intensity_left=int_l, intensity_right=int_r,
                    extrinsic=np.eye(4, dtype=np.float32))
        self._cache[index] = pair
        return dict(pair)
