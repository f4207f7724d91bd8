"""Audi A2D2 LiDAR-to-LiDAR pair source.

Re-designs `/root/reference/dataset/audi_dataset.py` (A2D2Dataset:34,
`lidar_to_lidar:143`, view-axis math `:360-403`, ratio split `:337-351`):
npz lidar sweeps per camera-direction directory, sensor extrinsics from
``cams_lidars.json`` view definitions (x/y axes + origin), ratio-based
train/val/test split over sorted file pairs.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from ..core.config import DataConfig

_EPS = 1.0e-10


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    if n < _EPS:
        raise ValueError('norm of view axis vector(s) too small')
    return v / n


def view_to_global(view: dict) -> np.ndarray:
    """Axes+origin 'view' -> 4x4 transform to global (audi_dataset.py:360-390)."""
    x_axis = _normalize(np.asarray(view['x-axis'], np.float64))
    y_axis = np.asarray(view['y-axis'], np.float64)
    # re-orthogonalise y against x, z = x cross y
    y_axis = _normalize(y_axis - x_axis * np.dot(y_axis, x_axis))
    z_axis = np.cross(x_axis, y_axis)
    T = np.eye(4)
    T[:3, 0], T[:3, 1], T[:3, 2] = x_axis, y_axis, z_axis
    T[:3, 3] = np.asarray(view['origin'], np.float64)
    return T


def transform_from_to(src_view: dict, dst_view: dict) -> np.ndarray:
    """src view frame -> dst view frame (audi_dataset.py:400-403)."""
    return np.linalg.inv(view_to_global(dst_view)) @ view_to_global(src_view)


class A2D2PairSource:
    """Pairs of npz lidar sweeps from two sensors, right aligned into left."""

    def __init__(self, cfg: DataConfig, split: str = 'train',
                 sensor_a: str = 'front_left', sensor_b: str = 'front_center',
                 cams_lidars_json: str = ''):
        self.cfg = cfg
        root = cfg.path
        calib_path = cams_lidars_json or os.path.join(root, 'cams_lidars.json')
        self.calib = json.load(open(calib_path))
        self.sensor_a, self.sensor_b = sensor_a, sensor_b

        files_a = self._lidar_files(root, f'cam_{sensor_a}')
        files_b = self._lidar_files(root, f'cam_{sensor_b}')
        pairs = list(zip(files_a, files_b))
        self.pairs = self._split(pairs, split)

        view_a = self.calib['cameras'][sensor_a]['view']
        view_b = self.calib['cameras'][sensor_b]['view']
        target = self.calib['vehicle']['view']
        ext_a = transform_from_to(view_a, target)
        ext_b = transform_from_to(view_b, target)
        # maps sensor-B points into the sensor-A frame (audi_dataset.py:162-164)
        self.extrinsic = (np.linalg.inv(ext_a) @ ext_b).astype(np.float32)

    @staticmethod
    def _lidar_files(root: str, token: str) -> List[str]:
        out = []
        for dirpath, _, files in os.walk(root):
            if token in dirpath:
                out += [os.path.join(dirpath, f) for f in files if f.endswith('.npz')]
        return sorted(out)

    def _split(self, pairs, split: str):
        r = self.cfg.split_ratios
        n = len(pairs)
        tr, va = int(r[0] * n), int((r[0] + r[1]) * n)
        return {'train': pairs[:tr], 'val': pairs[tr:va], 'test': pairs[va:]}[split]

    def __len__(self) -> int:
        return len(self.pairs)

    def load_pair(self, index: int) -> Dict[str, np.ndarray]:
        path_a, path_b = self.pairs[index]
        data_a, data_b = np.load(path_a), np.load(path_b)

        left = np.asarray(data_a['pcloud_points'], np.float32)
        int_l = np.asarray(data_a['pcloud_attr.reflectance'], np.float32)
        right = np.asarray(data_b['pcloud_points'], np.float32)
        int_r = np.asarray(data_b['pcloud_attr.reflectance'], np.float32)
        right = right @ self.extrinsic[:3, :3].T + self.extrinsic[:3, 3]
        return dict(pcd_left=left, pcd_right=right,
                    intensity_left=int_l, intensity_right=int_r,
                    extrinsic=self.extrinsic)
