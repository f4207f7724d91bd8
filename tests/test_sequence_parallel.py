"""Sequence-parallelism tests (SURVEY.md §5.7, VERDICT r1 next-step #9):
the serialized order sharded across the fake 8-device CPU mesh must
reproduce the single-device computation exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from pcd_reg_hregnet_tpu.parallel.sequence import (check_patch_alignment,
                                                   gspmd_sequence_apply,
                                                   halo_exchange,
                                                   sequence_sharding,
                                                   shardmap_depthwise_conv)


def seq_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ('seq',))


class TestAlignment:
    def test_aligned_ok(self):
        check_patch_alignment(1024, 64, 4)

    def test_patch_straddles_raises(self):
        with pytest.raises(ValueError, match='multiple of patch_size'):
            check_patch_alignment(1024, 48, 4)

    def test_indivisible_raises(self):
        with pytest.raises(ValueError, match='divide'):
            check_patch_alignment(1000, 64, 3)


class TestHaloConv:
    def test_shardmap_conv_matches_dense(self):
        # explicit ppermute halo exchange == single-device 'SAME' conv
        B, N, C, w = 2, 256, 8, 3
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
        kernel = jax.random.normal(jax.random.PRNGKey(1), (w, 1, C))
        want = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding='SAME',
            dimension_numbers=('NHC', 'HIO', 'NHC'), feature_group_count=C)
        for n_dev in (2, 4, 8):
            got = shardmap_depthwise_conv(x, kernel, seq_mesh(n_dev))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f'mesh={n_dev}')

    def test_halo_exchange_contents(self):
        # each shard must see [prev tail | own | next head], zeros at ends
        mesh = seq_mesh(4)
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1)

        from jax import shard_map
        f = jax.jit(shard_map(lambda xl: halo_exchange(xl, 1),
                              mesh=mesh, in_specs=(P(None, 'seq', None),),
                              out_specs=P(None, 'seq', None)))
        out = np.asarray(f(x)).reshape(4, 6)   # 4 shards x (1+4+1)
        np.testing.assert_array_equal(out[0], [0, 0, 1, 2, 3, 4])
        np.testing.assert_array_equal(out[1], [3, 4, 5, 6, 7, 8])
        np.testing.assert_array_equal(out[3], [11, 12, 13, 14, 15, 0])


class TestGSPMDSequenceApply:
    def test_ptv3_block_sequence_sharded_matches(self):
        # the full PTv3 block (CPE conv + patch attention + MLP) with the
        # serialized axis sharded over 4 devices == unsharded output
        from pcd_reg_hregnet_tpu.models.ptv3 import PTv3Block as Block
        B, N, C, K = 2, 512, 32, 64
        x = jax.random.normal(jax.random.PRNGKey(2), (B, N, C))
        block = Block(channels=C, num_heads=4, patch_size=K)
        variables = block.init(jax.random.PRNGKey(3), x)
        want = np.asarray(block.apply(variables, x))
        mesh = seq_mesh(4)
        got = gspmd_sequence_apply(block, variables, x, mesh, patch_size=K)
        assert got.sharding.is_equivalent_to(sequence_sharding(mesh), got.ndim)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)

    def test_misaligned_patch_rejected(self):
        from pcd_reg_hregnet_tpu.models.ptv3 import PTv3Block as Block
        x = jnp.zeros((1, 256, 32))
        block = Block(channels=32, num_heads=4, patch_size=128)
        variables = block.init(jax.random.PRNGKey(0), x)
        with pytest.raises(ValueError, match='patch_size'):
            gspmd_sequence_apply(block, variables, x, seq_mesh(4),
                                 patch_size=128)   # shard 64 < patch 128


class TestUserFacingSeqParallel:
    """VERDICT r4 #10: the --seq-parallel capability — the PTv3 encoder
    routed through GSPMD sequence sharding inside the production paths."""

    def test_encoder_seq_axis_matches_unsharded(self):
        # production L1 shapes: N=1024, C=64, patch 256, knn CPE
        from pcd_reg_hregnet_tpu.models.ptv3 import PointTransformerEncoder
        from pcd_reg_hregnet_tpu.parallel.sequence import sequence_mesh

        key = jax.random.PRNGKey(0)
        xyz = jax.random.uniform(key, (1, 1024, 3), minval=-40., maxval=40.)
        feat = jax.random.normal(jax.random.fold_in(key, 1), (1, 1024, 64))

        kw = dict(channels=64, depths=(2,), num_heads=(2,),
                  patch_size=256, cpe='knn')
        enc = PointTransformerEncoder(**kw)
        enc_sp = PointTransformerEncoder(**kw, seq_axis='seq')
        v = enc.init(jax.random.PRNGKey(1), xyz, feat)
        want = np.asarray(jax.jit(enc.apply)(v, xyz, feat))

        with sequence_mesh(seq_mesh(4)):
            got = jax.jit(enc_sp.apply)(v, xyz, feat)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)

    def test_evaluate_seq_parallel_matches(self, tmp_path):
        # the full eval runner: --seq-parallel 2 must reproduce the
        # unsharded summary on a tiny model_v6 config
        import dataclasses
        from pcd_reg_hregnet_tpu.data import batch_iterator, load_dataset
        from pcd_reg_hregnet_tpu.eval.runner import evaluate
        from pcd_reg_hregnet_tpu.core.config import LevelConfig
        from pcd_reg_hregnet_tpu.train import (RegistrationObjective,
                                               create_state, experiment)

        cfg = experiment('reg_v11')
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                levels=(LevelConfig(64, 16, (16, 16, 32), 32),
                        LevelConfig(32, 8, (32, 32, 64), 64),
                        LevelConfig(16, 8, (64, 64, 128), 128)),
                ptv3_patch_sizes=(16, 16, 8), ptv3_depths=(1,),
                ptv3_num_heads=(2,)),
            data=dataclasses.replace(cfg.data, dataset='synthetic',
                                     pcd_min_samples=128, batch_size=2))
        ds = load_dataset(cfg.data, 'test', length=2, points_per_cloud=256)
        batch = next(batch_iterator(ds, 2))
        obj = RegistrationObjective(cfg)
        state, _ = create_state(cfg, obj, batch, 1)

        base = evaluate(cfg, state, dataset=ds)
        sharded = evaluate(cfg, state, dataset=ds, seq_parallel=2)
        for k, v in base['summary'].items():
            assert np.isclose(sharded['summary'][k], v, rtol=1e-4, atol=1e-5), k

    def test_evaluate_seq_parallel_rejects_conv_backbone(self):
        import dataclasses
        from pcd_reg_hregnet_tpu.eval.runner import evaluate
        from pcd_reg_hregnet_tpu.train import experiment
        cfg = experiment('reg_v0')
        with pytest.raises(ValueError, match='ptv3'):
            evaluate(cfg, None, dataset=[], seq_parallel=2)
