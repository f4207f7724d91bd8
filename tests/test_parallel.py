"""Sharding/mesh tests on the 8-virtual-device CPU backend."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pcd_reg_hregnet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                               pad_to_multiple, replicated,
                                               shard_batch)


class TestMesh:
    def test_eight_virtual_devices(self):
        assert jax.device_count() == 8

    def test_make_mesh_sizes(self):
        assert make_mesh().devices.size == 8
        assert make_mesh(4).devices.size == 4

    def test_shard_batch_placement(self):
        mesh = make_mesh(4)
        batch = {'x': np.zeros((8, 16, 3), np.float32)}
        sharded = shard_batch(batch, mesh)
        assert sharded['x'].sharding == batch_sharding(mesh)
        # each device holds 2 of the 8 batch rows
        shard_shapes = {s.data.shape for s in sharded['x'].addressable_shards}
        assert shard_shapes == {(2, 16, 3)}

    def test_pad_to_multiple(self):
        batch = {'x': np.zeros((5, 3), np.float32)}
        out = pad_to_multiple(batch, 4)
        assert out['x'].shape[0] == 8

    def test_sharded_compute_matches_single_device(self):
        mesh = make_mesh(8)
        x = np.arange(8 * 32, dtype=np.float32).reshape(8, 32)

        def f(a):
            return jnp.sum(a ** 2, axis=1) + jnp.mean(a)  # mean = cross-shard

        expected = f(jnp.asarray(x))
        sharded_x = jax.device_put(x, batch_sharding(mesh))
        got = jax.jit(f, in_shardings=(batch_sharding(mesh),),
                      out_shardings=batch_sharding(mesh))(sharded_x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


class TestHybridMesh:
    def test_hybrid_mesh_shape_and_axes(self):
        from pcd_reg_hregnet_tpu.parallel.distributed import make_hybrid_mesh
        mesh = make_hybrid_mesh(ici_parallel=4, dcn_parallel=2)
        assert mesh.axis_names == ('dcn', 'ici')
        assert mesh.devices.shape == (2, 4)

    def test_hybrid_mesh_defaults_single_process(self):
        from pcd_reg_hregnet_tpu.parallel.distributed import make_hybrid_mesh
        mesh = make_hybrid_mesh()
        assert mesh.devices.size == 8
        assert mesh.devices.shape[0] == 1    # one process => one dcn group

    def test_hybrid_mesh_bad_factorisation(self):
        import pytest
        from pcd_reg_hregnet_tpu.parallel.distributed import make_hybrid_mesh
        with pytest.raises(ValueError):
            make_hybrid_mesh(ici_parallel=3, dcn_parallel=2)

    def test_batch_sharding_spans_both_axes(self):
        from pcd_reg_hregnet_tpu.parallel.distributed import make_hybrid_mesh
        mesh = make_hybrid_mesh(ici_parallel=4, dcn_parallel=2)
        batch = {'x': np.zeros((8, 16, 3), np.float32)}
        sharded = shard_batch(batch, mesh)
        shard_shapes = {s.data.shape for s in sharded['x'].addressable_shards}
        assert shard_shapes == {(1, 16, 3)}   # 8 rows over 8 devices

    def test_initialize_is_noop_single_process(self):
        from pcd_reg_hregnet_tpu.parallel import distributed
        assert distributed.initialize() is False
        assert jax.process_count() == 1

    def test_initialize_ignores_single_host_hostnames(self, monkeypatch):
        # Single-host tunnel runtimes export TPU_WORKER_HOSTNAMES=localhost;
        # that must NOT trigger pod autodetect (it crashed every train
        # entry once the backend was live).
        from pcd_reg_hregnet_tpu.parallel import distributed
        monkeypatch.setattr(distributed, '_initialized', False)
        monkeypatch.setenv('TPU_WORKER_HOSTNAMES', 'localhost')
        monkeypatch.delenv('MEGASCALE_COORDINATOR_ADDRESS', raising=False)
        assert distributed.initialize() is False

    def test_initialize_survives_live_backend_on_pod_env(self, monkeypatch):
        # Multi-entry hostnames DO autodetect, but a backend that is
        # already initialised must degrade to single-process, not raise.
        from pcd_reg_hregnet_tpu.parallel import distributed
        monkeypatch.setattr(distributed, '_initialized', False)
        monkeypatch.setenv('TPU_WORKER_HOSTNAMES', 'host0,host1')
        jnp.zeros(()).block_until_ready()    # ensure backend is live
        assert distributed.initialize() is False

    def test_train_step_on_hybrid_mesh(self):
        # the full reg_v0 train step compiled over the 2-D mesh: gradient
        # psum over both axes must produce a finite, decreasing loss
        from pcd_reg_hregnet_tpu.core.config import LevelConfig
        from pcd_reg_hregnet_tpu.data import batch_iterator, load_dataset
        from pcd_reg_hregnet_tpu.parallel.distributed import make_hybrid_mesh
        from pcd_reg_hregnet_tpu.train import (RegistrationObjective,
                                               create_state, experiment,
                                               make_train_step)
        cfg = experiment('reg_v0')
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                levels=(LevelConfig(32, 8, (16, 16, 32), 32),
                        LevelConfig(16, 8, (16, 16, 32), 32),
                        LevelConfig(8, 4, (32, 32, 64), 64))),
            data=dataclasses.replace(cfg.data, dataset='synthetic',
                                     pcd_min_samples=128, batch_size=8),
            train=dataclasses.replace(cfg.train, lr=1e-3, schedule='constant'))
        ds = load_dataset(cfg.data, 'train', length=8, points_per_cloud=256)
        batch = next(batch_iterator(ds, 8))
        mesh = make_hybrid_mesh(ici_parallel=4, dcn_parallel=2)
        obj = RegistrationObjective(cfg)
        state, tx = create_state(cfg, obj, batch, 1)
        step = make_train_step(obj, tx, mesh)
        sb = shard_batch(batch, mesh)
        state, m0 = step(state, sb)
        first = float(m0['loss'])
        for _ in range(6):
            state, m = step(state, sb)
        assert np.isfinite(first) and np.isfinite(float(m['loss']))
        assert float(m['loss']) < first


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            'graft_entry', '/root/repo/__graft_entry__.py')
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)
