"""Golden tests for core ops against numpy reference implementations."""
import jax
import jax.numpy as jnp
import numpy as np

from pcd_reg_hregnet_tpu.geometry import se3, so3
from pcd_reg_hregnet_tpu.ops import sampling as fps_mod
from pcd_reg_hregnet_tpu.ops import neighbors as knn_mod
from pcd_reg_hregnet_tpu.ops import serialization
from pcd_reg_hregnet_tpu.ops.procrustes import weighted_kabsch


def np_fps(xyz, m, w=None):
    """Literal numpy transcription of the CUDA FPS loop
    (furthest_point_sampling_gpu.cu:84-419)."""
    N = xyz.shape[0]
    temp = np.full(N, 1e10)
    idxs, last = [0], 0
    for _ in range(1, m):
        d = ((xyz - xyz[last]) ** 2).sum(-1)
        if w is not None:
            d = d * w
        temp = np.minimum(temp, d)
        last = int(temp.argmax())
        idxs.append(last)
    return np.array(idxs)


class TestFPS:
    def test_matches_reference_algorithm(self):
        xyz = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (3, 200, 3)))
        idx = np.asarray(fps_mod.fps(jnp.asarray(xyz), 32))
        for b in range(3):
            np.testing.assert_array_equal(idx[b], np_fps(xyz[b], 32))

    def test_weighted_matches_reference_algorithm(self):
        key = jax.random.PRNGKey(1)
        xyz = np.asarray(jax.random.uniform(key, (2, 150, 3)))
        w = np.asarray(jax.random.uniform(jax.random.PRNGKey(2), (2, 150))) + 0.1
        idx = np.asarray(fps_mod.weighted_fps(jnp.asarray(xyz), jnp.asarray(w), 24))
        for b in range(2):
            np.testing.assert_array_equal(idx[b], np_fps(xyz[b], 24, w[b]))

    def test_indices_unique(self):
        xyz = jax.random.uniform(jax.random.PRNGKey(3), (1, 128, 3))
        idx = np.asarray(fps_mod.fps(xyz, 64))[0]
        assert len(set(idx.tolist())) == 64

    def test_gather_points(self):
        pts = jax.random.normal(jax.random.PRNGKey(4), (2, 10, 5))
        idx = jnp.array([[0, 3, 7], [9, 1, 1]], dtype=jnp.int32)
        out = fps_mod.gather_points(pts, idx)
        assert out.shape == (2, 3, 5)
        np.testing.assert_allclose(out[0, 1], pts[0, 3])
        np.testing.assert_allclose(out[1, 2], pts[1, 1])


class TestKNN:
    def test_matches_numpy_sort(self):
        q = np.asarray(jax.random.uniform(jax.random.PRNGKey(5), (2, 20, 3)))
        db = np.asarray(jax.random.uniform(jax.random.PRNGKey(6), (2, 60, 3)))
        d2, idx = knn_mod.knn(jnp.asarray(q), jnp.asarray(db), 5)
        full = ((q[:, :, None] - db[:, None]) ** 2).sum(-1)
        ref_idx = np.argsort(full, axis=-1)[:, :, :5]
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(d2),
                                   np.take_along_axis(full, ref_idx, -1), atol=1e-5)

    def test_policy_branches_agree(self):
        # every selection strategy (single top_k, chunked two-stage,
        # approx PartialReduce) must return the same neighbour sets on the
        # CPU backend, across the N thresholds that pick between them
        for n, k in ((200, 8), (1500, 16), (5000, 32)):
            q = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 3))
            db = jax.random.uniform(jax.random.PRNGKey(2), (2, n, 3))
            d_auto, i_auto = knn_mod.knn(q, db, k)
            d_ex, i_ex = knn_mod.knn(q, db, k, approx=False)
            assert np.all(np.diff(np.asarray(d_ex), axis=-1) >= -1e-6)
            for b in range(2):
                for m in range(0, 32, 5):
                    assert set(np.asarray(i_auto)[b, m]) == set(np.asarray(i_ex)[b, m])

    def test_knn_policy_pin(self):
        # set_knn_policy('exact') must force the exact branch at approx-N
        # sizes and return identical neighbour sets on CPU (where the
        # approx lowering is exact anyway)
        q = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 3))
        db = jax.random.uniform(jax.random.PRNGKey(4), (1, 2048, 3))
        try:
            knn_mod.set_knn_policy('exact')
            _, i_ex = knn_mod.knn(q, db, 8)
            knn_mod.set_knn_policy('approx')
            _, i_ap = knn_mod.knn(q, db, 8)
        finally:
            knn_mod.set_knn_policy('auto')
        for m in range(16):
            assert set(np.asarray(i_ex)[0, m]) == set(np.asarray(i_ap)[0, m])

    def test_knn_gather_accelerator_paths_match(self, monkeypatch):
        # the one-hot and two-stage blocked gathers (accelerator paths) must
        # be bit-exact against take_along_axis, including non-multiple-of-
        # block N (padding branch)
        for n in (50, 4099, 4104):
            data = jax.random.normal(jax.random.PRNGKey(3), (2, n, 7))
            idx = jax.random.randint(jax.random.PRNGKey(4), (2, 10, 4), 0, n)
            knn_mod.set_gather_impl('taa')
            ref = np.asarray(knn_mod.knn_gather(data, idx))
            try:
                for impl in ('onehot', 'blocked'):
                    knn_mod.set_gather_impl(impl)
                    got = np.asarray(knn_mod.knn_gather(data, idx))
                    np.testing.assert_array_equal(got, ref,
                                                  err_msg=f'{impl} N={n}')
            finally:
                knn_mod.set_gather_impl('auto')

    def test_knn_group_features(self):
        key = jax.random.PRNGKey(7)
        xyz1 = jax.random.uniform(key, (1, 8, 3))
        xyz2 = jax.random.uniform(jax.random.PRNGKey(8), (1, 30, 3))
        feats = jax.random.normal(jax.random.PRNGKey(9), (1, 30, 6))
        grouped, knn_xyz = knn_mod.knn_group(xyz1, xyz2, feats, 4)
        assert grouped.shape == (1, 8, 4, 10)  # 3 rel + 1 dist + 6 feats
        assert knn_xyz.shape == (1, 8, 4, 3)
        # rel dist column matches norm of rel xyz
        np.testing.assert_allclose(
            np.asarray(grouped[..., 3]),
            np.linalg.norm(np.asarray(grouped[..., :3]), axis=-1), atol=1e-5)


class TestBallQuery:
    def test_matches_numpy_reference(self):
        q = np.asarray(jax.random.uniform(jax.random.PRNGKey(11), (2, 12, 3)))
        db = np.asarray(jax.random.uniform(jax.random.PRNGKey(12), (2, 64, 3)))
        radius, k = 0.35, 6
        idx, mask = knn_mod.ball_query(jnp.asarray(q), jnp.asarray(db), radius, k)
        idx, mask = np.asarray(idx), np.asarray(mask)
        full = ((q[:, :, None] - db[:, None]) ** 2).sum(-1)
        for b in range(2):
            for m in range(12):
                in_r = np.where(full[b, m] <= radius * radius)[0]
                want = in_r[np.argsort(full[b, m][in_r])][:k]
                nvalid = min(len(want), k)
                assert mask[b, m].sum() == nvalid
                np.testing.assert_array_equal(idx[b, m][:nvalid], want[:nvalid])
                if nvalid:  # short rows repeat the first valid neighbour
                    assert (idx[b, m][nvalid:] == idx[b, m][0]).all()

    def test_all_out_of_radius_row_masked(self):
        q = jnp.ones((1, 2, 3)) * 100.0
        db = jnp.zeros((1, 8, 3))
        idx, mask = knn_mod.ball_query(q, db, 0.5, 4)
        assert not np.asarray(mask).any()
        np.testing.assert_array_equal(np.asarray(idx), 0)


class TestThreeNNInterpolate:
    def test_matches_numpy_reference(self):
        q = np.asarray(jax.random.uniform(jax.random.PRNGKey(13), (2, 10, 3)))
        db = np.asarray(jax.random.uniform(jax.random.PRNGKey(14), (2, 40, 3)))
        f = np.asarray(jax.random.normal(jax.random.PRNGKey(15), (2, 40, 5)))
        out = np.asarray(knn_mod.three_nn_interpolate(
            jnp.asarray(q), jnp.asarray(db), jnp.asarray(f)))
        full = ((q[:, :, None] - db[:, None]) ** 2).sum(-1)
        for b in range(2):
            for m in range(10):
                nn3 = np.argsort(full[b, m])[:3]
                w = 1.0 / (full[b, m][nn3] + 1e-8)
                w = w / w.sum()
                # d2 from the matmul identity differs from direct (q-d)^2 at
                # f32 lsb level; the inverse-distance weights amplify it
                np.testing.assert_allclose(out[b, m], (w[:, None] * f[b, nn3]).sum(0),
                                           rtol=1e-3, atol=1e-4)

    def test_exact_at_database_points(self):
        # interpolating at the database points themselves reproduces the
        # features (the zero-distance weight dominates)
        db = jax.random.uniform(jax.random.PRNGKey(16), (1, 20, 3))
        f = jax.random.normal(jax.random.PRNGKey(17), (1, 20, 4))
        out = knn_mod.three_nn_interpolate(db, db, f)
        np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-4)


class TestWeightedKabsch:
    def test_recovers_exact_transform(self):
        key = jax.random.PRNGKey(10)
        src = jax.random.uniform(key, (4, 100, 3)) * 10
        R = so3.exp(jax.random.normal(jax.random.PRNGKey(11), (4, 3)) * 0.5)
        t = jax.random.normal(jax.random.PRNGKey(12), (4, 3))
        dst = se3.apply(R, t, src)
        w = jax.random.uniform(jax.random.PRNGKey(13), (4, 100)) + 0.1
        Rp, tp = weighted_kabsch(src, dst, w)
        np.testing.assert_allclose(Rp, R, atol=1e-4)
        np.testing.assert_allclose(tp, t, atol=1e-3)

    def test_proper_rotation_with_reflection_risk(self):
        # degenerate (planar) points can produce det=-1 without the fix
        src = jax.random.uniform(jax.random.PRNGKey(14), (2, 50, 3))
        src = src.at[..., 2].set(0.0)
        dst = -src  # reflection-ish correspondence
        R, t = weighted_kabsch(src, dst, jnp.ones((2, 50)))
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(2), atol=1e-4)

    def test_nonfinite_fallback_identity(self):
        src = jnp.full((1, 10, 3), jnp.nan)
        R, t = weighted_kabsch(src, src, jnp.ones((1, 10)))
        np.testing.assert_allclose(R[0], jnp.eye(3))
        np.testing.assert_allclose(t[0], jnp.zeros(3))

    def test_grad_flows(self):
        def loss(src):
            dst = src + 1.0
            R, t = weighted_kabsch(src, dst, jnp.ones((1, 20)))
            return jnp.sum(t)
        g = jax.grad(loss)(jax.random.uniform(jax.random.PRNGKey(15), (1, 20, 3)))
        assert jnp.all(jnp.isfinite(g))


class TestSerialization:
    def test_permutation_roundtrip(self):
        xyz = jax.random.uniform(jax.random.PRNGKey(16), (3, 64, 3)) * 50
        order, inverse = serialization.serialize(xyz)
        x = jax.random.normal(jax.random.PRNGKey(17), (3, 64, 7))
        xs = jnp.take_along_axis(x, order[..., None], axis=1)
        xr = jnp.take_along_axis(xs, inverse[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(xr), np.asarray(x))

    def test_zorder_locality(self):
        # points in the same octant should be contiguous in z-order
        xyz = jnp.array([[[0.1, 0.1, 0.1], [10.0, 10.0, 10.0],
                          [0.2, 0.2, 0.2], [10.1, 10.1, 10.1]]])
        order, _ = serialization.serialize(xyz, grid_size=1.0)
        o = np.asarray(order[0]).tolist()
        # neighbours {0,2} and {1,3} must be adjacent in the ordering
        pos = {v: i for i, v in enumerate(o)}
        assert abs(pos[0] - pos[2]) == 1
        assert abs(pos[1] - pos[3]) == 1

    def test_matches_numpy_morton(self):
        rng = np.random.RandomState(0)
        g = rng.randint(0, 2 ** 20, size=(50, 3)).astype(np.int64)

        def np_morton(v):
            out = 0
            for bit in range(20):
                for axis in range(3):
                    out |= ((int(v[axis]) >> bit) & 1) << (3 * bit + axis)
            return out

        hi, lo = serialization.z_order_keys(jnp.asarray(g))
        codes = (np.asarray(hi, dtype=np.uint64) << np.uint64(30)) | np.asarray(lo, dtype=np.uint64)
        expected = np.array([np_morton(v) for v in g], dtype=np.uint64)
        np.testing.assert_array_equal(codes, expected)


class TestSerializationDecode:
    def test_zorder_decode_roundtrip(self):
        from pcd_reg_hregnet_tpu.ops.serialization import (z_order_decode,
                                                           z_order_keys)
        rng = np.random.RandomState(0)
        g = jnp.asarray(rng.randint(0, 1 << 20, size=(4, 64, 3)), jnp.int32)
        hi, lo = z_order_keys(g)
        back = z_order_decode(hi, lo)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(g))

    def test_hilbert_decode_roundtrip(self):
        from pcd_reg_hregnet_tpu.ops.hilbert import hilbert_decode, hilbert_keys
        rng = np.random.RandomState(1)
        g = jnp.asarray(rng.randint(0, 1 << 16, size=(2, 64, 3)), jnp.int32)
        hi, lo = hilbert_keys(g, num_bits=16)
        back = hilbert_decode(hi, lo, num_bits=16)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(g))

    def test_hilbert_keys_bijective_small_cube(self):
        # every cell of a 4^3 cube must map to a distinct hilbert index
        from pcd_reg_hregnet_tpu.ops.hilbert import hilbert_keys
        xs = np.stack(np.meshgrid(*([np.arange(4)] * 3),
                                  indexing='ij'), -1).reshape(1, -1, 3)
        hi, lo = hilbert_keys(jnp.asarray(xs, jnp.int32), num_bits=2)
        codes = np.asarray(hi).astype(np.uint64) * (1 << 24) + np.asarray(lo)
        assert len(np.unique(codes[0])) == 64
        # ...and consecutive hilbert indices are adjacent cells (curve property)
        order = np.argsort(codes[0])
        pts = xs[0][order]
        d = np.abs(np.diff(pts, axis=0)).sum(axis=1)
        np.testing.assert_array_equal(d, np.ones(63))
