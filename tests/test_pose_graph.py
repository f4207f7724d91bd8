"""Pose-graph Gauss-Newton tests: convergence on synthetic noisy graphs,
single-device vs constraint-sharded multi-device equivalence."""
import jax
import jax.numpy as jnp
import numpy as np

from pcd_reg_hregnet_tpu.geometry import se3, so3
from pcd_reg_hregnet_tpu.parallel.mesh import make_mesh
from pcd_reg_hregnet_tpu.slam import (PoseGraph, chi2, distributed_optimize,
                                      optimize, residuals)


def make_ring_graph(key, K=16, noise=0.05, loop_closures=8):
    """Ground-truth ring of poses + noisy odometry & loop-closure edges."""
    ks = jax.random.split(key, 6)
    # ground-truth trajectory: random walk
    twists = jax.random.normal(ks[0], (K - 1, 6)) * 0.4
    gt = [jnp.eye(4)]
    for i in range(K - 1):
        gt.append(gt[-1] @ se3.exp(twists[i]))
    gt = jnp.stack(gt)

    edges_i, edges_j, Z = [], [], []
    # odometry chain
    for i in range(K - 1):
        edges_i.append(i); edges_j.append(i + 1)
        Z.append(se3.inverse(gt[i]) @ gt[i + 1])
    # random loop closures
    ii = jax.random.randint(ks[1], (loop_closures,), 0, K - 3)
    jj = ii + jax.random.randint(ks[2], (loop_closures,), 2, 3)
    for a, b in zip(np.asarray(ii), np.asarray(jj)):
        edges_i.append(int(a)); edges_j.append(int(b))
        Z.append(se3.inverse(gt[a]) @ gt[b])
    M = len(Z)
    Z = jnp.stack(Z)
    # measurement noise
    nz = se3.exp(jax.random.normal(ks[3], (M, 6)) * noise)
    Z = Z @ nz
    # initial guess: gt corrupted by larger noise (anchor pose exact)
    init_noise = se3.exp(jax.random.normal(ks[4], (K, 6)) * 0.3)
    init = gt @ init_noise
    init = init.at[0].set(gt[0])
    graph = PoseGraph(init, jnp.asarray(edges_i, jnp.int32),
                      jnp.asarray(edges_j, jnp.int32), Z, jnp.ones((M,)))
    return graph, gt


class TestPoseGraph:
    def test_zero_noise_recovers_exactly(self):
        graph, gt = make_ring_graph(jax.random.PRNGKey(0), noise=0.0)
        out = optimize(graph, iters=15)
        # residuals should vanish
        r = residuals(out, graph)
        assert float(jnp.abs(r).max()) < 1e-4
        # anchored solution matches ground truth
        err = se3.inverse(out) @ gt
        ang = so3.geodesic_distance(err[:, :3, :3],
                                    jnp.broadcast_to(jnp.eye(3), (len(gt), 3, 3)))
        assert float(jnp.rad2deg(ang).max()) < 0.1
        assert float(jnp.linalg.norm(err[:, :3, 3], axis=-1).max()) < 1e-3

    def test_reduces_chi2_with_noise(self):
        graph, _ = make_ring_graph(jax.random.PRNGKey(1), noise=0.05)
        before = float(chi2(graph.poses, graph))
        out = optimize(graph, iters=15)
        after = float(chi2(out, graph))
        assert after < 0.1 * before
        assert np.isfinite(after)

    def test_zero_weight_edges_ignored(self):
        graph, _ = make_ring_graph(jax.random.PRNGKey(2), noise=0.0)
        # append garbage edges with zero weight
        M = len(graph.weights)
        bad = PoseGraph(
            graph.poses,
            jnp.concatenate([graph.edges_i, jnp.zeros(4, jnp.int32)]),
            jnp.concatenate([graph.edges_j, jnp.full(4, 3, jnp.int32)]),
            jnp.concatenate([graph.measurements,
                             jnp.broadcast_to(se3.exp(jnp.ones(6)), (4, 4, 4))]),
            jnp.concatenate([graph.weights, jnp.zeros(4)]))
        out_clean = optimize(graph, iters=10)
        out_padded = optimize(bad, iters=10)
        np.testing.assert_allclose(np.asarray(out_clean), np.asarray(out_padded),
                                   atol=1e-5)

    def test_distributed_matches_single_device(self):
        graph, _ = make_ring_graph(jax.random.PRNGKey(3), K=12, noise=0.03,
                                   loop_closures=9)  # 11 + 9 = 20 edges
        M = len(graph.weights)
        mesh = make_mesh(4)
        pad = (-M) % 4
        padded = PoseGraph(
            graph.poses,
            jnp.concatenate([graph.edges_i, jnp.zeros(pad, jnp.int32)]),
            jnp.concatenate([graph.edges_j, jnp.zeros(pad, jnp.int32)]),
            jnp.concatenate([graph.measurements,
                             jnp.broadcast_to(jnp.eye(4), (pad, 4, 4))]),
            jnp.concatenate([graph.weights, jnp.zeros(pad)]))
        single = optimize(graph, iters=8)
        multi = distributed_optimize(padded, mesh, iters=8)
        np.testing.assert_allclose(np.asarray(single), np.asarray(multi),
                                   rtol=1e-4, atol=1e-4)


def make_chunked_graph(key, P=4, L=6, noise=0.03):
    """Ground-truth trajectory of K = P*L poses with chunk-local odometry,
    boundary (separator-separator) cross-chunk links, and a long loop
    closure between separators — the structure schur_optimize expects."""
    K = P * L
    ks = jax.random.split(key, 4)
    twists = jax.random.normal(ks[0], (K - 1, 6)) * 0.3
    gt = [jnp.eye(4)]
    for i in range(K - 1):
        gt.append(gt[-1] @ se3.exp(twists[i]))
    gt = jnp.stack(gt)

    edges_i, edges_j = [], []
    for i in range(K - 1):
        edges_i.append(i); edges_j.append(i + 1)   # odometry (boundary pairs cross)
    # in-chunk shortcut closures (interior-to-interior is fine within a chunk)
    for p in range(P):
        edges_i.append(p * L + 1); edges_j.append(p * L + L - 2)
    # long loop closure between separators: pose 0 (sep) <-> last pose (sep)
    edges_i.append(0); edges_j.append(K - 1)
    Z = jnp.stack([se3.inverse(gt[a]) @ gt[b] for a, b in zip(edges_i, edges_j)])
    M = len(edges_i)
    Z = Z @ se3.exp(jax.random.normal(ks[1], (M, 6)) * noise)
    init = gt @ se3.exp(jax.random.normal(ks[2], (K, 6)) * 0.25)
    init = init.at[0].set(gt[0])
    graph = PoseGraph(init, jnp.asarray(edges_i, jnp.int32),
                      jnp.asarray(edges_j, jnp.int32), Z, jnp.ones((M,)))
    return graph, gt


class TestSchurOptimize:
    def test_matches_dense_solve(self):
        from pcd_reg_hregnet_tpu.slam import partition_graph, schur_optimize
        graph, _ = make_chunked_graph(jax.random.PRNGKey(5))
        mesh = make_mesh(4)
        pg = partition_graph(graph, 4)
        dense = optimize(graph, iters=10)
        schur = schur_optimize(pg, mesh, iters=10)
        # both reach the same optimum (same normal equations, exact
        # elimination); compare converged poses
        np.testing.assert_allclose(np.asarray(dense), np.asarray(schur),
                                   rtol=1e-3, atol=1e-3)
        assert float(chi2(schur, graph)) <= float(chi2(graph.poses, graph)) * 0.1

    def test_zero_noise_recovers_gt(self):
        from pcd_reg_hregnet_tpu.slam import partition_graph, schur_optimize
        graph, gt = make_chunked_graph(jax.random.PRNGKey(6), noise=0.0)
        out = schur_optimize(partition_graph(graph, 4), make_mesh(4), iters=15)
        err = se3.inverse(out) @ gt
        assert float(jnp.linalg.norm(err[:, :3, 3], axis=-1).max()) < 1e-3

    def test_partitioner_rejects_interior_cross_edge(self):
        import pytest
        from pcd_reg_hregnet_tpu.slam import partition_graph
        graph, _ = make_chunked_graph(jax.random.PRNGKey(7))
        bad = PoseGraph(graph.poses,
                        jnp.concatenate([graph.edges_i, jnp.array([2], jnp.int32)]),
                        jnp.concatenate([graph.edges_j, jnp.array([14], jnp.int32)]),
                        jnp.concatenate([graph.measurements, jnp.eye(4)[None]]),
                        jnp.concatenate([graph.weights, jnp.ones(1)]))
        with pytest.raises(ValueError, match='interior'):
            partition_graph(bad, 4)


class TestSequencePipeline:
    def test_icp_sequence_recovers_trajectory(self):
        from pcd_reg_hregnet_tpu.slam import (build_pose_graph,
                                              icp_register_fn, optimize)
        # world scene observed from K drifting poses; each keyframe cloud is
        # the scene expressed in its own sensor frame
        key = jax.random.PRNGKey(9)
        scene = jax.random.uniform(key, (1, 256, 3), minval=-10.0, maxval=10.0)
        K = 6
        tw = jax.random.normal(jax.random.fold_in(key, 1), (K - 1, 6)) * 0.1
        gt = [jnp.eye(4)]
        for k in range(K - 1):
            gt.append(gt[-1] @ se3.exp(tw[k]))
        gt = jnp.stack(gt)                                  # X_k world poses
        clouds = jnp.concatenate(
            [se3.transform(se3.inverse(gt[k])[None], scene) for k in range(K)])

        edges = [(k, k + 1) for k in range(K - 1)] + [(0, K - 1)]
        graph = build_pose_graph(clouds, edges,
                                 icp_register_fn('point_to_point', max_iters=25))
        out = optimize(graph, iters=10)
        # gauge: both trajectories anchored at pose 0 = identity
        err = se3.inverse(out) @ gt
        ang = so3.geodesic_distance(err[:, :3, :3],
                                    jnp.broadcast_to(jnp.eye(3), (K, 3, 3)))
        assert float(jnp.rad2deg(ang).max()) < 0.5
        assert float(jnp.linalg.norm(err[:, :3, 3], axis=-1).max()) < 0.05

    def test_model_register_fn_shapes(self):
        from pcd_reg_hregnet_tpu.slam import build_pose_graph, model_register_fn
        from pcd_reg_hregnet_tpu.core.config import LevelConfig
        from pcd_reg_hregnet_tpu import models
        levels = (LevelConfig(32, 8, (8, 8, 16), 16),
                  LevelConfig(16, 8, (16, 16, 32), 32),
                  LevelConfig(8, 4, (32, 32, 64), 64))
        m = models.build('hregnet', levels=levels)
        clouds = jax.random.uniform(jax.random.PRNGKey(2), (3, 64, 3))
        v = m.init(jax.random.PRNGKey(0), clouds[:1], clouds[:1], train=False)
        graph = build_pose_graph(clouds, [(0, 1), (1, 2)],
                                 model_register_fn(m, v))
        assert graph.poses.shape == (3, 4, 4)
        assert graph.measurements.shape == (2, 4, 4)
        assert np.isfinite(np.asarray(graph.poses)).all()
