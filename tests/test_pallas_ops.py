"""Pallas kernels validated against the XLA reference ops (interpret mode
on CPU; the same tests run compiled when a TPU is attached)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pcd_reg_hregnet_tpu.ops.pallas.fps import fps_pallas, weighted_fps_pallas
from pcd_reg_hregnet_tpu.ops.sampling import _fps_impl

INTERPRET = jax.default_backend() == 'cpu'


def run(fn, *args):
    if INTERPRET:
        with pltpu.force_tpu_interpret_mode():
            return fn(*args)
    return fn(*args)


class TestPallasFPS:
    @pytest.mark.parametrize('n,m', [(256, 128), (300, 64), (1024, 256)])
    def test_matches_xla_reference(self, n, m):
        xyz = jax.random.uniform(jax.random.PRNGKey(0), (3, n, 3)) * 40
        got = np.asarray(run(fps_pallas, xyz, m))
        ref = np.asarray(_fps_impl(xyz, None, m))
        np.testing.assert_array_equal(got, ref)

    def test_weighted_matches_xla_reference(self):
        key = jax.random.PRNGKey(1)
        xyz = jax.random.uniform(key, (2, 384, 3)) * 40
        w = jax.random.uniform(jax.random.PRNGKey(2), (2, 384)) + 0.1
        got = np.asarray(run(weighted_fps_pallas, xyz, w, 128))
        ref = np.asarray(_fps_impl(xyz, w, 128))
        np.testing.assert_array_equal(got, ref)

    def test_batch_padding(self):
        # B not a multiple of the kernel's batch tile (8)
        xyz = jax.random.uniform(jax.random.PRNGKey(3), (5, 256, 3)) * 40
        got = np.asarray(run(fps_pallas, xyz, 128))
        ref = np.asarray(_fps_impl(xyz, None, 128))
        np.testing.assert_array_equal(got, ref)


class TestHilbert:
    def test_matches_numpy_skilling(self):
        from pcd_reg_hregnet_tpu.ops.hilbert import hilbert_keys
        rng = np.random.RandomState(0)
        g = rng.randint(0, 2 ** 10, size=(100, 3)).astype(np.int64)

        def np_hilbert(locs, nb):
            n = locs.shape[0]
            gray = ((locs[..., None] >> np.arange(nb - 1, -1, -1)) & 1).astype(bool)
            for bit in range(nb):
                for dim in range(3):
                    mask = gray[:, dim, bit]
                    gray[mask, 0, bit + 1:] ^= True
                    to_flip = (~mask[:, None]) & (gray[:, 0, bit + 1:] ^ gray[:, dim, bit + 1:])
                    gray[:, dim, bit + 1:] ^= to_flip
                    gray[:, 0, bit + 1:] ^= to_flip
            flat = np.swapaxes(gray, 1, 2).reshape(n, 3 * nb)
            out = flat.copy()
            for i in range(1, 3 * nb):
                out[:, i] = out[:, i] ^ out[:, i - 1]
            vals = np.zeros(n, dtype=np.uint64)
            for i in range(3 * nb):
                vals = (vals << np.uint64(1)) | out[:, i].astype(np.uint64)
            return vals

        hi, lo = hilbert_keys(jnp.asarray(g), num_bits=10)
        got = (np.asarray(hi, np.uint64) << np.uint64(24)) | np.asarray(lo, np.uint64)
        np.testing.assert_array_equal(got, np_hilbert(g, 10))

    def test_serialize_dispatch_and_locality(self):
        from pcd_reg_hregnet_tpu.ops.serialization import serialize
        xyz = jax.random.uniform(jax.random.PRNGKey(4), (2, 128, 3)) * 50
        for order in ('hilbert', 'hilbert-trans'):
            o, inv = serialize(xyz, grid_size=1.0, order=order)
            x = jnp.take_along_axis(xyz, o[..., None], axis=1)
            xr = jnp.take_along_axis(x, inv[..., None], axis=1)
            np.testing.assert_allclose(np.asarray(xr), np.asarray(xyz))
        # hilbert ordering is more local than the identity ordering
        o, _ = serialize(xyz, grid_size=1.0, order='hilbert')
        x = np.asarray(jnp.take_along_axis(xyz, o[..., None], axis=1))[0]
        d_sorted = np.linalg.norm(np.diff(x, axis=0), axis=1).mean()
        d_raw = np.linalg.norm(np.diff(np.asarray(xyz)[0], axis=0), axis=1).mean()
        assert d_sorted < 0.7 * d_raw


class TestPallasPatchAttention:
    def _qkv(self, key, R=3, H=2, K=32, d=16, dtype=jnp.float32):
        ks = jax.random.split(key, 3)
        shape = (R, H, K, d)
        return (jax.random.normal(ks[0], shape, dtype),
                jax.random.normal(ks[1], shape, dtype),
                jax.random.normal(ks[2], shape, dtype))

    def test_matches_dense_reference(self):
        from pcd_reg_hregnet_tpu.ops.pallas.attention import (
            patch_attention, _dense_reference)
        q, k, v = self._qkv(jax.random.PRNGKey(0))
        scale = (q.shape[-1]) ** -0.5
        got = run(lambda a, b, c: patch_attention(a, b, c, scale), q, k, v)
        want = _dense_reference(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_io(self):
        from pcd_reg_hregnet_tpu.ops.pallas.attention import (
            patch_attention, _dense_reference)
        q, k, v = self._qkv(jax.random.PRNGKey(1), dtype=jnp.bfloat16)
        scale = (q.shape[-1]) ** -0.5
        got = run(lambda a, b, c: patch_attention(a, b, c, scale), q, k, v)
        assert got.dtype == jnp.bfloat16
        want = _dense_reference(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_gradients_match_dense(self):
        from pcd_reg_hregnet_tpu.ops.pallas.attention import (
            patch_attention, _dense_reference)
        q, k, v = self._qkv(jax.random.PRNGKey(2), R=2, H=1, K=16, d=8)
        scale = q.shape[-1] ** -0.5

        def loss_pallas(q, k, v):
            return jnp.sum(jnp.sin(patch_attention(q, k, v, scale)))

        def loss_dense(q, k, v):
            return jnp.sum(jnp.sin(_dense_reference(q, k, v, scale)))

        gp = run(lambda *a: jax.grad(loss_pallas, argnums=(0, 1, 2))(*a), q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_model_uses_pallas_path(self, monkeypatch):
        # the flax module must produce the same outputs via both impls
        from pcd_reg_hregnet_tpu.models.ptv3 import (PatchAttention,
                                                     set_attn_impl)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 32))
        mod = PatchAttention(channels=32, num_heads=4, patch_size=16)
        set_attn_impl('xla')
        var = mod.init(jax.random.PRNGKey(4), x)
        want = mod.apply(var, x)
        try:
            set_attn_impl('pallas')
            with pltpu.force_tpu_interpret_mode():
                got = mod.apply(var, x)
        finally:
            set_attn_impl('auto')
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestPallasFPSGrad:
    def test_grad_through_fps_pipeline(self):
        # training differentiates through gather(fps(xyz)) — the FPS indices
        # are non-diff (stop_gradient) but the surrounding pipeline must
        # still grad cleanly with the Pallas kernel engaged (regression:
        # pallas_call has no JVP rule and crashed the TPU train step)
        from pcd_reg_hregnet_tpu.ops.sampling import (fps, gather_points,
                                                      set_fps_impl)

        def loss(xyz):
            idx = fps(xyz, 16)
            kp = gather_points(xyz, idx)
            return jnp.sum(kp * kp)

        xyz = jax.random.uniform(jax.random.PRNGKey(0), (2, 128, 3))
        set_fps_impl('pallas')
        try:
            with pltpu.force_tpu_interpret_mode():
                g = jax.grad(loss)(xyz)
        finally:
            set_fps_impl('auto')
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0
