"""Contract tests for the native (C++) host point-cloud library."""
import os
import subprocess

import numpy as np
import pytest

from pcd_reg_hregnet_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='cc/libpcd_native.so not built (make -C cc)')


class TestFilterResample:
    def test_shapes_and_range(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-120, 120, size=(5000, 4)).astype(np.float32)
        xyz, inten = native.filter_resample(pts, max_range=80.0, n_out=1024, seed=7)
        assert xyz.shape == (1024, 3) and inten.shape == (1024,)
        assert np.all(np.linalg.norm(xyz, axis=1) < 80.0)

    def test_deterministic_per_seed(self):
        pts = np.random.default_rng(1).uniform(-50, 50, (2000, 4)).astype(np.float32)
        a, _ = native.filter_resample(pts, 80.0, 256, seed=42)
        b, _ = native.filter_resample(pts, 80.0, 256, seed=42)
        c, _ = native.filter_resample(pts, 80.0, 256, seed=43)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_pad_when_too_few(self):
        pts = np.random.default_rng(2).uniform(-10, 10, (50, 4)).astype(np.float32)
        xyz, _ = native.filter_resample(pts, 80.0, 128, seed=0)
        assert xyz.shape == (128, 3)
        # the first 50 outputs are the inputs in order (pad semantics)
        np.testing.assert_allclose(xyz[:50], pts[:50, :3])

    def test_subsample_no_replacement(self):
        pts = np.random.default_rng(3).uniform(-10, 10, (500, 4)).astype(np.float32)
        xyz, _ = native.filter_resample(pts, 80.0, 400, seed=0)
        # all rows unique (sample without replacement)
        assert len(np.unique(xyz, axis=0)) == 400

    def test_matches_numpy_filter_semantics(self):
        from pcd_reg_hregnet_tpu.data.pipeline import range_filter
        pts = np.random.default_rng(4).uniform(-120, 120, (1000, 4)).astype(np.float32)
        kept_np, _ = range_filter(pts[:, :3], 80.0)
        # native returns the survivor count
        lib = native._load()
        out_xyz = np.empty((100, 3), np.float32)
        out_int = np.empty((100,), np.float32)
        kept = lib.pc_filter_resample(native._f32p(pts), 1000, 4,
                                      np.float32(80.0), 100, 0,
                                      native._f32p(out_xyz), native._f32p(out_int))
        assert kept == len(kept_np)


class TestLoadBin:
    def test_roundtrip(self, tmp_path):
        pts = np.random.default_rng(5).uniform(-60, 60, (300, 5)).astype(np.float32)
        path = str(tmp_path / 'cloud.pcd.bin')
        pts.tofile(path)
        xyz, inten = native.load_bin(path, 80.0, 256, seed=0)
        assert xyz.shape == (256, 3)
        # every output xyz must exist in the input
        sample = {tuple(np.round(r, 4)) for r in pts[:, :3]}
        assert all(tuple(np.round(r, 4)) in sample for r in xyz[:10])

    def test_missing_file(self):
        with pytest.raises(IOError):
            native.load_bin('/nonexistent/file.bin', 80.0, 16)


class TestTransform:
    def test_matches_numpy(self):
        pts = np.random.default_rng(6).uniform(-5, 5, (100, 3)).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [1, 2, 3]
        T[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
        expected = pts @ T[:3, :3].T + T[:3, 3]
        got = native.transform_inplace(pts.copy(), T)
        np.testing.assert_allclose(got, expected, atol=1e-5)
