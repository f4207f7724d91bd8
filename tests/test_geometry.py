"""Property tests for the SO(3)/SE(3) Lie-group math and rotation conversions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcd_reg_hregnet_tpu.geometry import perturbations, rotations, se3, so3


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (16, 3))
        w = w / (1.0 + jnp.linalg.norm(w, axis=-1, keepdims=True)) * 3.0  # |w| < pi
        np.testing.assert_allclose(so3.log(so3.exp(w)), w, atol=1e-5)

    def test_exp_orthogonal(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
        R = so3.exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(8), atol=1e-5)

    def test_small_angle_stable(self):
        for scale in (1e-3, 1e-6, 1e-9):
            w = jnp.array([[1.0, -2.0, 0.5]]) * scale
            back = so3.log(so3.exp(w))
            np.testing.assert_allclose(back, w, rtol=1e-3, atol=1e-12)

    def test_zero_angle(self):
        R = so3.exp(jnp.zeros((2, 3)))
        np.testing.assert_allclose(R, jnp.broadcast_to(jnp.eye(3), (2, 3, 3)), atol=1e-7)
        assert jnp.all(jnp.isfinite(so3.log(R)))

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda w: jnp.sum(so3.exp(w)))(jnp.zeros(3))
        assert jnp.all(jnp.isfinite(g))


class TestSE3:
    def test_exp_log_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (16, 6)) * 0.5
        np.testing.assert_allclose(se3.log(se3.exp(x)), x, atol=1e-5)

    def test_inverse(self):
        T = se3.exp(jax.random.normal(jax.random.PRNGKey(3), (4, 6)) * 0.5)
        eye = jnp.broadcast_to(jnp.eye(4), T.shape)
        np.testing.assert_allclose(T @ se3.inverse(T), eye, atol=1e-5)

    def test_transform_matches_matmul(self):
        T = se3.exp(jax.random.normal(jax.random.PRNGKey(4), (2, 6)))
        p = jax.random.normal(jax.random.PRNGKey(5), (2, 10, 3))
        hom = jnp.concatenate([p, jnp.ones((2, 10, 1))], axis=-1)
        expected = jnp.einsum('bij,bnj->bni', T, hom)[..., :3]
        np.testing.assert_allclose(se3.transform(T, p), expected, atol=1e-5)


class TestRotations:
    def test_euler_roundtrip(self):
        ang = jax.random.uniform(jax.random.PRNGKey(6), (16, 3), minval=-1.2, maxval=1.2)
        R = rotations.euler_xyz_to_matrix(ang)
        np.testing.assert_allclose(rotations.matrix_to_euler_xyz(R), ang, atol=1e-5)

    def test_euler_matches_pytorch3d_convention(self):
        # R = Rx @ Ry @ Rz (pytorch3d "XYZ"): validate against explicit products
        ax, ay, az = 0.3, -0.7, 1.1
        Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
        Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
        Rz = np.array([[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]])
        R = Rx @ Ry @ Rz
        out = rotations.matrix_to_euler_xyz(jnp.asarray(R))
        np.testing.assert_allclose(out, [ax, ay, az], atol=1e-6)

    def test_quaternion_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(7), (32, 3))
        R = so3.exp(w)
        q = rotations.matrix_to_quaternion(R)
        np.testing.assert_allclose(rotations.quaternion_to_matrix(q), R, atol=1e-5)


class TestPerturbations:
    def test_igt_is_rigid_and_bounded(self):
        igt = perturbations.sample_igt(jax.random.PRNGKey(8), max_deg=20.0,
                                       max_tran=0.5, batch=64)
        R, t = se3.unpack(igt)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(64), atol=1e-4)
        # per-axis uniform(+-amp) rotation => total angle <= sqrt(3)*20deg
        ang = so3.log(R)
        assert float(jnp.max(jnp.linalg.norm(ang, axis=-1))) <= np.sqrt(3) * np.deg2rad(20) + 1e-4
        assert float(jnp.max(jnp.abs(t))) <= 0.5 + 1e-5

    def test_deterministic_given_key(self):
        a = perturbations.sample_igt(jax.random.PRNGKey(9), batch=4)
        b = perturbations.sample_igt(jax.random.PRNGKey(9), batch=4)
        np.testing.assert_array_equal(a, b)

    def test_inverse_gaussian_distribution(self):
        # reference `transform/dataset_transforms.py:88-115`: IG draws are
        # normalised then scaled, so directions land in the all-positive
        # octant and magnitudes stay bounded exactly like 'uniform'
        igt = perturbations.sample_igt(jax.random.PRNGKey(10), max_deg=20.0,
                                       max_tran=0.5, batch=64,
                                       distribution='inverse_gaussian')
        R, t = se3.unpack(igt)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(64), atol=1e-4)
        ang = so3.log(R)
        assert float(jnp.max(jnp.linalg.norm(ang, axis=-1))) <= np.deg2rad(20) + 1e-4
        assert float(jnp.max(jnp.linalg.norm(t, axis=-1))) <= 0.5 + 1e-5
        # IG samples are strictly positive => rotation axis components all >0
        assert bool(jnp.all(ang > -1e-6))

    def test_invgauss_matches_scipy_moments(self):
        # the MSH sampler must match scipy's invgauss(mu, scale) moments:
        # mean = mu*scale, var = mu^3*scale^2
        from pcd_reg_hregnet_tpu.geometry.perturbations import _sample_invgauss
        mu, scale = 1.0, 0.1
        x = np.asarray(_sample_invgauss(jax.random.PRNGKey(11), mu, scale,
                                        (20000,)))
        assert np.all(x > 0)
        np.testing.assert_allclose(x.mean(), mu * scale, rtol=0.05)
        np.testing.assert_allclose(x.var(), mu ** 3 * scale ** 2, rtol=0.1)
