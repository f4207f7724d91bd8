"""MAN TruckScenes LiDAR-to-LiDAR pair source (clean-room table reader).

Re-designs `/root/reference/dataset/man_dataset.py` (TruckScenesLoader:30,
TruckScenesDataset:43, `lidar_to_lidar:108`, `get_extrinsic_matrix:421`,
`load_lidar_point_cloud:345`) without the truckscenes devkit dependency:
the devkit's nuScenes-style relational tables (scene / sample /
sample_data / calibrated_sensor / ego_pose, JSON under
``<path>/<version>/``) are read directly.

Extrinsic chain (maps sensor-B points into the sensor-A frame, matching
`get_extrinsic_matrix`):

    T = inv(T_csA) @ inv(T_poseA) @ T_poseB @ T_csB

where T_cs* are calibrated_sensor (sensor -> ego) and T_pose* ego_pose
(ego -> global) transforms at each sensor's sweep timestamp.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..core.config import DataConfig
from ..geometry.rotations import quaternion_to_matrix


def _quat_to_mat(q) -> np.ndarray:
    """(w, x, y, z) quaternion -> 3x3 rotation (pyquaternion convention)."""
    return np.asarray(quaternion_to_matrix(np.asarray(q, np.float64)))


def _pose_matrix(record: dict) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = _quat_to_mat(record['rotation'])
    T[:3, 3] = np.asarray(record['translation'])
    return T


def load_lidar_bin(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read a nuScenes/TruckScenes ``.pcd.bin``: float32 rows of
    (x, y, z, intensity, ...).  Returns (points [N, 3], intensity [N])."""
    raw = np.fromfile(path, dtype=np.float32)
    for width in (5, 4, 6):
        if raw.size % width == 0:
            pts = raw.reshape(-1, width)
            return pts[:, :3].copy(), pts[:, 3].copy()
    raise ValueError(f'unrecognised point record width in {path}')


class TruckScenesTables:
    """Minimal loader for the devkit's relational JSON tables."""

    TABLES = ('scene', 'sample', 'sample_data', 'calibrated_sensor',
              'ego_pose', 'sensor')

    def __init__(self, dataroot: str, version: str):
        self.dataroot = dataroot
        table_dir = os.path.join(dataroot, version)
        self._by_token: Dict[str, Dict[str, dict]] = {}
        self._rows: Dict[str, List[dict]] = {}
        for name in self.TABLES:
            path = os.path.join(table_dir, f'{name}.json')
            rows = json.load(open(path)) if os.path.exists(path) else []
            self._rows[name] = rows
            self._by_token[name] = {r['token']: r for r in rows}

    def get(self, table: str, token: str) -> dict:
        return self._by_token[table][token]

    def rows(self, table: str) -> List[dict]:
        return self._rows[table]


def _load_splits_file(cfg: DataConfig) -> Optional[Dict[str, List[str]]]:
    """Locate the official scene-split lists: ``{split: [scene names]}``.

    The reference gets these from the truckscenes devkit's
    ``create_splits_scenes()`` (`dataset/man_dataset.py:11,174-232` — the
    devkit ships them as static lists in ``truckscenes/utils/splits.py``).
    Here the same lists are read from a JSON file: ``cfg.splits_file`` if
    set, else ``<dataroot>/<version>/splits.json`` or
    ``<dataroot>/splits.json``.  Returns None when no file exists."""
    if cfg.splits_file:
        # explicit path: missing is a configuration error, never silently
        # fall back to auto-discovery (silent fallbacks re-open the
        # train/val leakage this feature exists to close)
        if not os.path.exists(cfg.splits_file):
            raise FileNotFoundError(f'splits_file {cfg.splits_file!r} not found')
        raw = json.load(open(cfg.splits_file))
        return {k: list(v) for k, v in raw.items()}
    candidates = []
    if cfg.path:
        candidates.append(os.path.join(cfg.path, cfg.version, 'splits.json'))
        candidates.append(os.path.join(cfg.path, 'splits.json'))
    for path in candidates:
        if os.path.exists(path):
            raw = json.load(open(path))
            return {k: list(v) for k, v in raw.items()}
    return None


def _hash_split(name: str, ratios) -> str:
    """Deterministic disjoint split by scene name (md5 -> [0,1) bucket)."""
    import hashlib
    frac = int(hashlib.md5(name.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
    if frac < ratios[0]:
        return 'train'
    if frac < ratios[0] + ratios[1]:
        return 'val'
    return 'test'


def select_scenes(scenes: List[dict], split: str, cfg: DataConfig) -> List[dict]:
    """Split-disjoint scene selection (reference `get_scene_tokens`,
    `man_dataset.py:174-242`).

    With an official splits file: keep the scenes whose *name* is in the
    split's list AND present in this version's tables (the reference
    likewise drops names `field2token` can't find).  ``mini_train`` /
    ``mini_val`` lists are honoured for mini versions.  Without a file:
    a deterministic md5-of-scene-name split with `cfg.split_ratios` —
    disjoint across train/val/test by construction (fixes round-1's
    train/val leakage: all splits used to see every scene)."""
    lists = _load_splits_file(cfg)
    if lists is not None:
        names = lists.get(split)
        if names is None and 'mini' in cfg.version:
            names = lists.get(f'mini_{split}')
        if names is None:
            names = []
        wanted = set(names)
        return [s for s in scenes if s['name'] in wanted]
    return [s for s in scenes
            if _hash_split(s['name'], cfg.split_ratios) == split]


class TruckScenesPairSource:
    """L2L registration-pair source over TruckScenes samples.

    Walks the split's scenes' sample chains (first_sample_token -> next),
    keeping one pair per (keyframe) sample: the two configured lidar
    channels with the right cloud pre-transformed into the left sensor
    frame — the same item contract the reference's `lidar_to_lidar`
    produces.
    """

    def __init__(self, cfg: DataConfig, split: str = 'train'):
        self.cfg = cfg
        self.split = split
        self.tables = TruckScenesTables(cfg.path, cfg.version)
        self.samples = self._collect_samples(split)

    def _collect_samples(self, split: str) -> List[dict]:
        scenes = sorted(self.tables.rows('scene'), key=lambda s: s['name'])
        scenes = select_scenes(scenes, split, self.cfg)
        if self.cfg.limscenes:
            scenes = scenes[: self.cfg.limscenes]
        samples = []
        for scene in scenes:
            token = scene['first_sample_token']
            while token:
                sample = self.tables.get('sample', token)
                samples.append(sample)
                token = sample['next']
        return samples

    @property
    def scene_names(self) -> List[str]:
        """Names of the scenes this split selected (for disjointness checks)."""
        seen = {self.tables.get('sample', s['token'])['scene_token']
                for s in self.samples}
        return sorted(self.tables.get('scene', t)['name'] for t in seen)

    def __len__(self) -> int:
        return len(self.samples)

    def _sample_data_token(self, sample: dict, channel: str) -> str:
        if 'data' in sample:
            return sample['data'][channel]
        # devkit-style denormalised tables: search sample_data rows
        for row in self.tables.rows('sample_data'):
            if row['sample_token'] == sample['token'] and row.get('channel') == channel:
                return row['token']
        raise KeyError(f'no sample_data for channel {channel}')

    def extrinsic(self, token_a: str, token_b: str) -> np.ndarray:
        sd_a = self.tables.get('sample_data', token_a)
        sd_b = self.tables.get('sample_data', token_b)
        cs_a = _pose_matrix(self.tables.get('calibrated_sensor', sd_a['calibrated_sensor_token']))
        cs_b = _pose_matrix(self.tables.get('calibrated_sensor', sd_b['calibrated_sensor_token']))
        pose_a = _pose_matrix(self.tables.get('ego_pose', sd_a['ego_pose_token']))
        pose_b = _pose_matrix(self.tables.get('ego_pose', sd_b['ego_pose_token']))
        return np.linalg.inv(cs_a) @ np.linalg.inv(pose_a) @ pose_b @ cs_b

    def load_pair(self, index: int) -> Dict[str, np.ndarray]:
        sample = self.samples[index]
        ch_a, ch_b = self.cfg.lidar_tokens
        tok_a = self._sample_data_token(sample, ch_a)
        tok_b = self._sample_data_token(sample, ch_b)
        extrinsic = self.extrinsic(tok_a, tok_b).astype(np.float32)

        def load(token, transform):
            sd = self.tables.get('sample_data', token)
            pts, inten = load_lidar_bin(os.path.join(self.cfg.path, sd['filename']))
            if transform:
                pts = pts @ extrinsic[:3, :3].T + extrinsic[:3, 3]
            return pts.astype(np.float32), inten

        left, int_l = load(tok_a, transform=False)
        right, int_r = load(tok_b, transform=True)
        return dict(pcd_left=left, pcd_right=right,
                    intensity_left=int_l, intensity_right=int_r,
                    extrinsic=extrinsic)

    def load_camera_lidar(self, index: int) -> Dict[str, np.ndarray]:
        """C2L mode: pair a camera with a lidar sweep
        (reference `camera_to_lidar`, `man_dataset.py:136-172`).

        `cfg.lidar_tokens` is read as (CAM_CHANNEL, LIDAR_CHANNEL).  The
        lidar cloud is transformed into the camera frame via the same
        calibrated_sensor/ego_pose chain; the camera intrinsic and the
        image file path are returned so callers can render depth features
        with `projection.render_depth_images` (image decoding is left to
        the consumer — the registration models operate on points).
        """
        sample = self.samples[index]
        cam_ch, lidar_ch = self.cfg.lidar_tokens
        tok_cam = self._sample_data_token(sample, cam_ch)
        tok_lid = self._sample_data_token(sample, lidar_ch)
        extrinsic = self.extrinsic(tok_cam, tok_lid).astype(np.float32)

        sd_lid = self.tables.get('sample_data', tok_lid)
        pts, inten = load_lidar_bin(os.path.join(self.cfg.path, sd_lid['filename']))
        pts = (pts @ extrinsic[:3, :3].T + extrinsic[:3, 3]).astype(np.float32)

        sd_cam = self.tables.get('sample_data', tok_cam)
        cs_cam = self.tables.get('calibrated_sensor', sd_cam['calibrated_sensor_token'])
        intrinsic = np.asarray(cs_cam.get('camera_intrinsic', np.eye(3)),
                               np.float32)
        return dict(pcd=pts, intensity=inten, extrinsic=extrinsic,
                    intrinsic=intrinsic,
                    img_shape=np.asarray([sd_cam.get('height', 0),
                                          sd_cam.get('width', 0)], np.int32),
                    image_path=os.path.join(self.cfg.path,
                                            sd_cam.get('filename', '')))
