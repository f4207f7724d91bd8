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


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            'graft_entry', '/root/repo/__graft_entry__.py')
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)
