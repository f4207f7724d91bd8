"""Tests for the data pipeline: shapes, decalibration protocol, determinism."""
import numpy as np

from pcd_reg_hregnet_tpu.core.config import DataConfig
from pcd_reg_hregnet_tpu.data import batch_iterator, load_dataset
from pcd_reg_hregnet_tpu.data.pipeline import (apply_decalibration,
                                               perturbation_table,
                                               range_filter, resample)
from pcd_reg_hregnet_tpu.geometry import se3

CFG = DataConfig(dataset='synthetic', pcd_min_samples=128)


class TestPreproc:
    def test_range_filter(self):
        pts = np.array([[0, 0, 1.0], [100, 0, 0], [10, 10, 0]], np.float32)
        out, _ = range_filter(pts, 80.0)
        assert len(out) == 2

    def test_resample_pad_and_subsample(self):
        rng = np.random.default_rng(0)
        small = rng.normal(size=(10, 3)).astype(np.float32)
        out, _ = resample(small, 64, rng)
        assert out.shape == (64, 3)
        big = rng.normal(size=(500, 3)).astype(np.float32)
        out, _ = resample(big, 64, rng)
        assert out.shape == (64, 3)
        # subsample without replacement: all rows must come from the input
        assert all(any(np.allclose(r, b) for b in big) for r in out[:5])


class TestDataset:
    def test_item_contract(self):
        ds = load_dataset(CFG, 'train', length=4, points_per_cloud=256)
        item = ds[0]
        n = CFG.pcd_min_samples
        assert item['pcd_left'].shape == (n, 3)
        assert item['pcd_right'].shape == (n, 3)
        assert item['uncalibed_pcd'].shape == (n, 3)
        assert item['igt'].shape == (4, 4)
        # igt applied to pcd_right must reproduce uncalibed_pcd
        igt = item['igt']
        expected = item['pcd_right'] @ igt[:3, :3].T + igt[:3, 3]
        np.testing.assert_allclose(item['uncalibed_pcd'], expected, atol=1e-4)

    def test_igt_bounded_by_protocol(self):
        ds = load_dataset(CFG, 'test', length=8, points_per_cloud=256)
        for i in range(8):
            igt = ds[i]['igt']
            R, t = np.asarray(se3.unpack(igt[None])[0])[0], igt[:3, 3]
            assert np.abs(t).max() <= 0.5 + 1e-5
            ang = np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))
            assert ang <= np.sqrt(3) * 20 + 1e-3

    def test_eval_split_deterministic(self):
        a = load_dataset(CFG, 'val', length=4, points_per_cloud=256)
        b = load_dataset(CFG, 'val', length=4, points_per_cloud=256)
        np.testing.assert_array_equal(a[1]['igt'], b[1]['igt'])
        np.testing.assert_array_equal(a[1]['uncalibed_pcd'], b[1]['uncalibed_pcd'])

    def test_train_epoch_changes_perturbation(self):
        ds = load_dataset(CFG, 'train', length=4, points_per_cloud=256)
        igt0 = ds[0]['igt'].copy()
        ds.set_epoch(1)
        igt1 = ds[0]['igt']
        assert not np.allclose(igt0, igt1)

    def test_perturbation_table_roundtrip(self, tmp_path):
        path = str(tmp_path / 'perturb.txt')
        t1 = perturbation_table(path, 10, CFG, seed=5)
        t2 = perturbation_table(path, 10, CFG, seed=999)  # must load the cache
        np.testing.assert_array_equal(t1, t2)
        assert t1.shape == (10, 6)


class TestBatching:
    def test_batch_shapes(self):
        ds = load_dataset(CFG, 'train', length=6, points_per_cloud=256)
        batches = list(batch_iterator(ds, 2))
        assert len(batches) == 3
        b = batches[0]
        assert b['pcd_left'].shape == (2, 128, 3)
        assert b['igt'].shape == (2, 4, 4)

    def test_shuffle_reproducible(self):
        ds = load_dataset(CFG, 'train', length=6, points_per_cloud=256)
        a = [b['igt'][0, 0, 3] for b in batch_iterator(ds, 2, shuffle=True, seed=3)]
        b = [b['igt'][0, 0, 3] for b in batch_iterator(ds, 2, shuffle=True, seed=3)]
        np.testing.assert_array_equal(a, b)


class TestProjection:
    def test_project_to_image_bounds(self):
        from pcd_reg_hregnet_tpu.data.projection import project_to_image
        K = np.array([[100., 0., 32.], [0., 100., 24.], [0., 0., 1.]])
        pts = np.array([[0., 0., 10.],     # center -> (32, 24)
                        [1., 0., 10.],     # -> (42, 24)
                        [0., 0., -5.],     # behind camera
                        [50., 0., 1.]])    # off image
        u, v, r, valid = project_to_image((48, 64), K, pts, np.linalg.norm(pts, axis=1))
        assert valid.tolist() == [True, True, False, False]
        assert u.tolist() == [32, 42] and v.tolist() == [24, 24]

    def test_azimuth_filter(self):
        from pcd_reg_hregnet_tpu.data.projection import azimuth_filter
        pts = np.array([[1., 0., 0.],      # 0 deg -> keep
                        [0., 1., 0.],      # 90 -> drop (max 50)
                        [-1., -1., 0.],    # -135 -> drop (min -130)
                        [0., -1., 0.]])    # -90 -> keep
        out = azimuth_filter(pts)
        assert out.shape == (2, 3)

    def test_render_depth_images_matches_host_projection(self):
        import jax.numpy as jnp
        from pcd_reg_hregnet_tpu.data.projection import (DepthImageRenderer,
                                                         project_to_image)
        rng = np.random.RandomState(0)
        pts = rng.uniform(-5, 5, size=(2, 64, 3)).astype('f')
        pts[..., 2] = np.abs(pts[..., 2]) + 1.0          # in front of camera
        K = np.array([[40., 0., 32.], [0., 40., 24.], [0., 0., 1.]], 'f')
        rng_arr = np.linalg.norm(pts, axis=-1)
        inten = rng.rand(2, 64).astype('f')
        dens = rng.rand(2, 64).astype('f')
        gen = DepthImageRenderer((48, 64), K, jnp.asarray(rng_arr),
                                 jnp.asarray(inten), jnp.asarray(dens))
        eye = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
        img, p = gen(eye, jnp.asarray(pts))
        assert img.shape == (2, 3, 48, 64)
        np.testing.assert_allclose(np.asarray(p), pts, atol=1e-5)
        u, v, r, valid = project_to_image((48, 64), K, pts[0], rng_arr[0])
        got = np.asarray(img)[0, 0, v, u]
        # scatter .set keeps one of the colliding writes; check nonzero
        assert (got > 0).all()

    def test_c2l_loader_contract(self, tmp_path):
        # minimal synthetic TruckScenes table set with one camera + lidar
        import json, dataclasses
        from pcd_reg_hregnet_tpu.core.config import DataConfig
        from pcd_reg_hregnet_tpu.data.truckscenes import TruckScenesPairSource
        root = tmp_path
        (root / 'v1.0-mini').mkdir()
        (root / 'sweeps').mkdir()
        pts = np.random.RandomState(0).rand(32, 5).astype('f')
        pts.tofile(root / 'sweeps' / 'lidar.pcd.bin')
        eye_pose = dict(rotation=[1., 0., 0., 0.], translation=[0., 0., 0.])
        tables = {
            'scene': [dict(token='sc', name='scene-1', first_sample_token='sa')],
            'sample': [dict(token='sa', next='',
                            data=dict(CAMERA_LEFT='sd_cam', LIDAR_LEFT='sd_lid'))],
            'sample_data': [
                dict(token='sd_cam', sample_token='sa', channel='CAMERA_LEFT',
                     calibrated_sensor_token='cs_cam', ego_pose_token='ep',
                     filename='img.jpg', height=48, width=64),
                dict(token='sd_lid', sample_token='sa', channel='LIDAR_LEFT',
                     calibrated_sensor_token='cs_lid', ego_pose_token='ep',
                     filename='sweeps/lidar.pcd.bin'),
            ],
            'calibrated_sensor': [
                dict(token='cs_cam', camera_intrinsic=np.eye(3).tolist(), **eye_pose),
                dict(token='cs_lid', **eye_pose),
            ],
            'ego_pose': [dict(token='ep', **eye_pose)],
            'sensor': [],
        }
        for name, rows in tables.items():
            json.dump(rows, open(root / 'v1.0-mini' / f'{name}.json', 'w'))
        cfg = DataConfig(dataset='man', path=str(root), version='v1.0-mini',
                         mode='C2L', lidar_tokens=('CAMERA_LEFT', 'LIDAR_LEFT'))
        src = TruckScenesPairSource(cfg, 'train')
        item = src.load_camera_lidar(0)
        assert item['pcd'].shape == (32, 3)
        assert item['intrinsic'].shape == (3, 3)
        assert item['img_shape'].tolist() == [48, 64]
        assert item['image_path'].endswith('img.jpg')


class TestParallelLoader:
    def test_threaded_iterator_matches_sync(self):
        # num_workers > 0 must yield byte-identical batches in the same
        # order as the synchronous path (determinism contract)
        from pcd_reg_hregnet_tpu.core.config import DataConfig
        from pcd_reg_hregnet_tpu.data import batch_iterator, load_dataset
        cfg = DataConfig(dataset='synthetic', pcd_min_samples=64, batch_size=4)
        ds = load_dataset(cfg, 'train', length=12, points_per_cloud=128)
        sync = list(batch_iterator(ds, 4, shuffle=True, seed=3, epoch=1))
        par = list(batch_iterator(ds, 4, shuffle=True, seed=3, epoch=1,
                                  num_workers=4, prefetch=2))
        assert len(sync) == len(par) == 3
        for a, b in zip(sync, par):
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


class TestVoxelAndStubs:
    def test_voxel_downsample_merges_cells(self):
        from pcd_reg_hregnet_tpu.data.pipeline import voxel_downsample
        pts = np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02],
                        [1.0, 1.0, 1.0]], np.float32)
        inten = np.array([0.0, 1.0, 0.5], np.float32)
        out, oi = voxel_downsample(pts, 0.1, inten)
        assert out.shape[0] == 2
        # the merged cell averages its two members
        merged = out[np.argmin(np.linalg.norm(out, axis=1))]
        np.testing.assert_allclose(merged, [0.015, 0.015, 0.015], atol=1e-6)
        assert sorted(oi.tolist()) == [0.5, 0.5]

    def test_voxel_downsample_empty(self):
        from pcd_reg_hregnet_tpu.data.pipeline import voxel_downsample
        pts = np.zeros((0, 3), np.float32)
        out, _ = voxel_downsample(pts, 0.1)
        assert out.shape[0] == 0

    def test_kitti_nuscenes_are_declared_stubs(self):
        import pytest
        for name in ('kitti', 'nuscenes'):
            cfg = DataConfig(dataset=name)
            with pytest.raises(NotImplementedError):
                load_dataset(cfg, 'train')
