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
