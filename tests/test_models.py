"""Forward-pass and shape tests for every model variant (small configs)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcd_reg_hregnet_tpu.core.config import LevelConfig
from pcd_reg_hregnet_tpu.models import RegistrationModel, model_config
from pcd_reg_hregnet_tpu.models.zoo import available

SMALL_LEVELS = (
    LevelConfig(64, 16, (16, 16, 32), 32),
    LevelConfig(32, 8, (32, 32, 64), 64),
    LevelConfig(16, 8, (64, 64, 128), 128),
)


def small_cfg(name, **kw):
    cfg = model_config(name)
    over = dict(levels=SMALL_LEVELS)
    if cfg.backbone == 'ptv3':
        over['ptv3_patch_sizes'] = (16, 16, 16)
        over['ptv3_depths'] = (1, 1)
        over['ptv3_num_heads'] = (2, 4)
    over.update(kw)
    return dataclasses.replace(cfg, **over)


def make_inputs(n=256, batch=2):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return (jax.random.uniform(k1, (batch, n, 3)) * 20,
            jax.random.uniform(k2, (batch, n, 3)) * 20)


class TestVariants:
    @pytest.mark.parametrize('name', [n for n in available() if n != 'model_v5'])
    def test_forward(self, name):
        cfg = small_cfg(name)
        if cfg.backbone == 'attention':
            pytest.skip('v5 attention backbone tested separately')
        model = RegistrationModel(cfg)
        src, dst = make_inputs()
        variables = model.init(jax.random.PRNGKey(0), src, dst, train=False)
        out = model.apply(variables, src, dst, train=False)

        assert len(out['rotation']) == 3 and len(out['translation']) == 3
        for R, t in zip(out['rotation'], out['translation']):
            assert R.shape == (2, 3, 3) and t.shape == (2, 3)
            np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)),
                                       np.ones(2), atol=1e-3)
        if cfg.mi_from_fine2 or cfg.mi_from_coarse:
            for k in ('mi_weights', 'mi_weights_prime', 'mi_feats', 'mi_feats_prime'):
                assert k in out
        if cfg.circle_dists:
            assert out['coord_dist'].shape == out['feats_dist'].shape

    def test_train_mode_updates_batch_stats(self):
        model = RegistrationModel(small_cfg('hregnet'))
        src, dst = make_inputs()
        variables = model.init(jax.random.PRNGKey(0), src, dst, train=False)
        _, mutated = model.apply(variables, src, dst, train=True,
                                 mutable=['batch_stats'])
        before = jax.tree.leaves(variables['batch_stats'])
        after = jax.tree.leaves(mutated['batch_stats'])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))

    def test_identity_pair_small_pose(self):
        """src == dst must yield a near-identity pose even untrained:
        correspondences are convex combos of real neighbours."""
        model = RegistrationModel(small_cfg('hregnet'))
        src, _ = make_inputs()
        variables = model.init(jax.random.PRNGKey(1), src, src, train=False)
        out = model.apply(variables, src, src, train=False)
        for R, t in zip(out['rotation'], out['translation']):
            assert bool(jnp.all(jnp.isfinite(R))) and bool(jnp.all(jnp.isfinite(t)))
        # per-level translation is a convex combo of in-cloud points, so it
        # stays within the cloud extent at the coarse level
        t3_norm = float(jnp.linalg.norm(out['translation'][0], axis=-1).max())
        assert t3_norm < 3.0 * 20.0

    def test_jit_and_grad(self):
        model = RegistrationModel(small_cfg('hregnet'))
        src, dst = make_inputs(n=128, batch=1)
        variables = model.init(jax.random.PRNGKey(0), src, dst, train=False)

        @jax.jit
        def loss_fn(params):
            out = model.apply({'params': params,
                               'batch_stats': variables['batch_stats']},
                              src, dst, train=False)
            return jnp.sum(out['translation'][2] ** 2)

        g = jax.grad(loss_fn)(variables['params'])
        leaves = jax.tree.leaves(g)
        assert all(jnp.all(jnp.isfinite(l)) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestFusedEvalTowers:
    def test_concat_tower_equals_two_calls(self):
        """RegistrationModel's eval path runs ONE fused 2B-batch feature
        tower (FPS loops + kNN run once, not twice back-to-back).  That is
        only sound if every tower op is per-example in eval mode (BN uses
        running stats): tower(concat(a, b)) == concat(tower(a), tower(b))."""
        from pcd_reg_hregnet_tpu.models.registration import HierFeatureExtraction
        cfg = small_cfg('model_v6')
        net = HierFeatureExtraction(cfg)
        src, dst = make_inputs()
        v = net.init(jax.random.PRNGKey(0), src, train=False)
        both = net.apply(v, jnp.concatenate([src, dst], 0), train=False)
        s = net.apply(v, src, train=False)
        d = net.apply(v, dst, train=False)
        for k in s:
            np.testing.assert_allclose(both[k][:2], s[k], rtol=0, atol=1e-5,
                                       err_msg=k)
            np.testing.assert_allclose(both[k][2:], d[k], rtol=0, atol=1e-5,
                                       err_msg=k)


class TestAttentionModel:
    def test_v5_forward(self):
        import dataclasses
        from pcd_reg_hregnet_tpu.models.attention import AttentionRegistrationModel
        cfg = dataclasses.replace(model_config('model_v5'), levels=SMALL_LEVELS)
        model = AttentionRegistrationModel(cfg)
        src, dst = make_inputs(n=256, batch=2)
        variables = model.init(jax.random.PRNGKey(0), src, dst, train=False)
        out = model.apply(variables, src, dst, train=False)
        assert len(out['rotation']) == 3
        assert out['rotation'][2].shape == (2, 3, 3)
        for k in ('mi_weights', 'mi_feats', 'src_xyz_2_trans', 'dst_xyz_2'):
            assert k in out
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(out['rotation'][2])),
                                   np.ones(2), atol=1e-3)

    def test_v5_via_zoo(self):
        import dataclasses
        from pcd_reg_hregnet_tpu.models import build
        m = build('model_v5', levels=SMALL_LEVELS)
        assert type(m).__name__ == 'AttentionRegistrationModel'


class TestFullPTv3:
    def test_encdec_forward_and_grad(self):
        from pcd_reg_hregnet_tpu.models import PointTransformerV3
        net = PointTransformerV3(
            enc_channels=(16, 32, 64), enc_depths=(1, 1, 1),
            enc_heads=(2, 4, 4), dec_channels=(16, 32), dec_depths=(1, 1),
            dec_heads=(2, 4), patch_size=16, grid_size=0.05)
        xyz = jax.random.uniform(jax.random.PRNGKey(0), (2, 128, 3),
                                 minval=-10.0, maxval=10.0)
        feat = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 8))
        v = net.init(jax.random.PRNGKey(2), xyz, feat, False)
        out, _ = net.apply(v, xyz, feat, True, mutable=['batch_stats'])
        assert out.shape == (2, 128, 16)
        assert np.all(np.isfinite(np.asarray(out)))

        def loss(p):
            o = net.apply({'params': p, 'batch_stats': v['batch_stats']},
                          xyz, feat, False)
            return jnp.sum(o ** 2)
        g = jax.grad(loss)(v['params'])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)

    def test_pooling_halves_points(self):
        from pcd_reg_hregnet_tpu.models import SerializedPooling
        pool = SerializedPooling(channels=32, stride=2)
        xyz = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 3))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 16))
        v = pool.init(jax.random.PRNGKey(2), xyz, x, False)
        (nxyz, nx), _ = pool.apply(v, xyz, x, True, mutable=['batch_stats'])
        assert nxyz.shape == (2, 32, 3) and nx.shape == (2, 32, 32)


class TestMixedPrecision:
    def test_bf16_compute_forward_close_to_f32(self):
        """compute_dtype='bfloat16' runs and stays close to the f32 pose."""
        src, dst = make_inputs()
        m32 = RegistrationModel(small_cfg('hregnet'))
        v = m32.init(jax.random.PRNGKey(0), src, dst, train=False)
        out32 = m32.apply(v, src, dst, train=False)

        m16 = RegistrationModel(small_cfg('hregnet', compute_dtype='bfloat16'))
        out16 = m16.apply(v, src, dst, train=False)
        for R, t in zip(out16['rotation'], out16['translation']):
            assert R.dtype == jnp.float32 and t.dtype == jnp.float32
            assert bool(jnp.isfinite(R).all()) and bool(jnp.isfinite(t).all())
        # deeper levels diverge discretely (bf16 perturbs the WFPS weights and
        # hence which points are re-sampled), so compare the *continuous*
        # level-1 path: FPS/kNN run in f32 and are identical, and the
        # attention-weighted keypoints should agree to centimetres on
        # +/-20 m clouds
        kp32 = out32['src_feats']['xyz_1']
        kp16 = out16['src_feats']['xyz_1']
        mean_dev = float(jnp.mean(jnp.linalg.norm(kp32 - kp16, axis=-1)))
        assert mean_dev < 0.1, mean_dev
