"""Tests for all loss families against hand-computed / property expectations."""
import jax
import jax.numpy as jnp
import numpy as np

from pcd_reg_hregnet_tpu.geometry import se3, so3
from pcd_reg_hregnet_tpu.losses import (DeepMILoss, chamfer_loss,
                                        matching_loss, overlap_circle_loss,
                                        prob_chamfer_loss, transformation_loss)


class TestTransformationLoss:
    def test_zero_at_exact_pose(self):
        R = so3.exp(jax.random.normal(jax.random.PRNGKey(0), (4, 3)) * 0.3)
        t = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
        out = transformation_loss(R, t, R, t, alpha=1.0)
        assert float(out['loss']) < 1e-4
        np.testing.assert_allclose(np.asarray(out['rre']), np.zeros(4), atol=1e-2)
        np.testing.assert_allclose(np.asarray(out['rte']), np.zeros(4), atol=1e-5)

    def test_known_rotation_error(self):
        # 10 degrees about z
        ang = np.deg2rad(10.0)
        R_pred = so3.exp(jnp.array([[0.0, 0.0, ang]]))
        R_gt = jnp.eye(3)[None]
        out = transformation_loss(R_pred, jnp.zeros((1, 3)), R_gt, jnp.zeros((1, 3)))
        np.testing.assert_allclose(float(out['rre'][0]), 10.0, rtol=1e-4)
        np.testing.assert_allclose(float(out['rot_err'][2]), 10.0, rtol=1e-4)

    def test_known_translation_error(self):
        t_pred = jnp.array([[3.0, 4.0, 0.0]])
        out = transformation_loss(jnp.eye(3)[None], t_pred,
                                  jnp.eye(3)[None], jnp.zeros((1, 3)))
        np.testing.assert_allclose(float(out['rte'][0]), 5.0, rtol=1e-6)


class TestProbChamfer:
    def test_aligned_keypoints_low_loss(self):
        kp = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 3))
        R = so3.exp(jax.random.normal(jax.random.PRNGKey(3), (2, 3)) * 0.2)
        t = jax.random.normal(jax.random.PRNGKey(4), (2, 3)) * 0.1
        kp2 = se3.apply(R, t, kp)  # kp transformed by gt
        sig = jnp.ones((2, 32))
        aligned = prob_chamfer_loss(kp, kp2, sig, sig, R, t)
        misaligned = prob_chamfer_loss(kp, kp2 + 1.0, sig, sig, R, t)
        assert float(aligned) < float(misaligned)

    def test_no_sigma_branch(self):
        kp = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 3))
        loss = prob_chamfer_loss(kp, kp, None, None, jnp.eye(3)[None], jnp.zeros((1, 3)))
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-3)


class TestMatchingLoss:
    def test_perfect_correspondence_low(self):
        kp = jax.random.uniform(jax.random.PRNGKey(6), (1, 16, 3))
        desc = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 8)) * 5
        sig = jnp.ones((1, 16))
        eye, zero = jnp.eye(3)[None], jnp.zeros((1, 3))
        low = matching_loss(kp, sig, desc, kp, sig, desc, eye, zero)
        perm = jnp.flip(kp, axis=1)
        high = matching_loss(kp, sig, desc, perm, sig, desc, eye, zero)
        assert float(low) < float(high)


class TestChamfer:
    def test_identical_zero(self):
        p = jax.random.uniform(jax.random.PRNGKey(8), (2, 64, 3))
        assert float(chamfer_loss(p, p, scale=50.0)) < 1e-3

    def test_reductions(self):
        a = jax.random.uniform(jax.random.PRNGKey(9), (3, 32, 3))
        b = jax.random.uniform(jax.random.PRNGKey(10), (3, 32, 3))
        none = chamfer_loss(a, b, reduction='none')
        assert none.shape == (3,)
        np.testing.assert_allclose(float(chamfer_loss(a, b, reduction='mean')),
                                   float(jnp.mean(none)), rtol=1e-6)
        np.testing.assert_allclose(float(chamfer_loss(a, b, reduction='sum')),
                                   float(jnp.sum(none)), rtol=1e-6)


class TestMILoss:
    def test_forward_and_grad(self):
        mi = DeepMILoss(global_in_channels=32, local_in_channels=16)
        key = jax.random.PRNGKey(11)
        kwargs = dict(
            x_global=jax.random.normal(key, (4, 32)),
            x_global_prime=jax.random.normal(jax.random.PRNGKey(12), (4, 32)),
            x_local=jax.random.normal(jax.random.PRNGKey(13), (4, 64, 16)),
            x_local_prime=jax.random.normal(jax.random.PRNGKey(14), (4, 64, 16)),
            c_local=jax.random.normal(jax.random.PRNGKey(15), (4, 64, 16)),
            c_global=jax.random.normal(jax.random.PRNGKey(16), (4, 32)),
        )
        variables = mi.init(key, **kwargs)
        loss = mi.apply(variables, **kwargs)
        assert jnp.isfinite(loss)
        g = jax.grad(lambda p: mi.apply({'params': p}, **kwargs))(variables['params'])
        assert all(jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(g))

    def test_local_only_and_global_only(self):
        local = DeepMILoss(local_in_channels=16)
        kwargs = dict(x_local=jnp.ones((2, 8, 16)), x_local_prime=jnp.zeros((2, 8, 16)),
                      c_local=jnp.ones((2, 8, 16)))
        v = local.init(jax.random.PRNGKey(17), **kwargs)
        assert jnp.isfinite(local.apply(v, **kwargs))

        glob = DeepMILoss(global_in_channels=16)
        kwargs = dict(x_global=jnp.ones((2, 16)), x_global_prime=jnp.zeros((2, 16)),
                      c_global=jnp.ones((2, 16)))
        v = glob.init(jax.random.PRNGKey(18), **kwargs)
        assert jnp.isfinite(glob.apply(v, **kwargs))


class TestCircleLoss:
    def test_separable_features_lower_loss(self):
        key = jax.random.PRNGKey(19)
        coords = jax.random.uniform(key, (2, 32, 8)) * 3.0
        pos = coords < 1.5
        # good features: small dist where positive, large where negative
        good = jnp.where(pos, 0.05, 1.8)
        bad = jnp.where(pos, 1.8, 0.05)
        assert float(overlap_circle_loss(coords, good)) < float(overlap_circle_loss(coords, bad))

    def test_finite_and_differentiable(self):
        coords = jax.random.uniform(jax.random.PRNGKey(20), (1, 16, 8)) * 2
        feats = jax.random.uniform(jax.random.PRNGKey(21), (1, 16, 8)) * 2
        g = jax.grad(lambda f: overlap_circle_loss(coords, f))(feats)
        assert jnp.all(jnp.isfinite(g))
