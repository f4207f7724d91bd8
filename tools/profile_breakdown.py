"""Per-component time breakdown of the flagship train step -> results/profile_r4.md.

VERDICT r2 #4: "produce a per-op time breakdown of the B=8 train step ...
then attack the top item".  Times, on the attached chip at production
shapes (B=8, N=8096, pyramid 1024/512/256):

  * isolated hot ops: FPS, WFPS, kNN (exact + approx), knn_gather at the
    detector-L1 shape, knn_group, CPE neighbourhood build, one PTv3 block;
  * cumulative model prefixes: detector L1 -> +encoder L1 -> +L2 -> +L3 ->
    both towers -> + coarse/fine/heads (full forward);
  * full forward, full train step (fwd+bwd+AdamW), for f32 and bf16;
  * objective-only grad (isolates optimizer cost).

Every timed function reduces outputs to one scalar (no DCE / no dict
readback traps).  Writes a markdown table with ms and % of train step.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 8
N = 8096
ITERS = 10


def timeit(fn, *args, iters=ITERS):
    # np.asarray forces a VALUE transfer through the tunnel — the only
    # reliable sync on axon (block_until_ready returns before the remote
    # value lands; measured 0.04 ms for a 268 MB-matrix op = dispatch only)
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def scalarize(f):
    # sum of SQUARES: a plain linear sum of a matmul/gather output lets
    # XLA's algebraic simplifier collapse sum(onehot @ data) into
    # (sum onehot) @ data — the op being measured disappears.  x*x blocks
    # the rewrite.
    def g(*a):
        leaves = jax.tree_util.tree_leaves(f(*a))
        return sum(jnp.sum(l.astype(jnp.float32) * l.astype(jnp.float32))
                   for l in leaves)
    return jax.jit(g)


def main() -> int:
    from pcd_reg_hregnet_tpu.models import build
    from pcd_reg_hregnet_tpu.models.ptv3 import cpe_neighbors
    from pcd_reg_hregnet_tpu.ops.neighbors import knn, knn_gather, knn_group
    from pcd_reg_hregnet_tpu.ops.sampling import fps, gather_points, weighted_fps
    from pcd_reg_hregnet_tpu.train import experiment
    from pcd_reg_hregnet_tpu.train.loop import create_state, make_train_step
    from pcd_reg_hregnet_tpu.train.objective import RegistrationObjective
    from pcd_reg_hregnet_tpu.parallel.mesh import make_mesh, shard_batch
    from pcd_reg_hregnet_tpu.data import batch_iterator, load_dataset

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (B, N, 3), minval=-60., maxval=60.)
    pts2 = jax.random.uniform(jax.random.fold_in(key, 1), (B, N, 3),
                              minval=-60., maxval=60.)
    feats64 = jax.random.normal(jax.random.fold_in(key, 2), (B, N, 64))
    w = jax.random.uniform(jax.random.fold_in(key, 3), (B, N))
    kp = pts[:, :1024]

    rows = []

    def rec(name, ms):
        rows.append((name, ms))
        print(f'{name:<44}{ms:9.3f} ms', flush=True)

    # ---- isolated ops -----------------------------------------------------
    rec('fps 8096->1024', timeit(scalarize(lambda p: fps(p, 1024)), pts))
    rec('weighted_fps 8096->1024',
        timeit(scalarize(lambda p, ww: weighted_fps(p, ww, 1024)), pts, w))
    rec('knn L1 q1024 db8096 k64 (approx default)',
        timeit(scalarize(lambda q, d: knn(q, d, 64)[1]), kp, pts))
    rec('knn L1 exact',
        timeit(scalarize(lambda q, d: knn(q, d, 64, approx=False)[1]), kp, pts))
    idx = knn(kp, pts, 64)[1]
    data67 = jnp.concatenate([pts, feats64], axis=-1)
    # NOTE (r4): the r3 version of this row timed knn_gather WITHOUT
    # exact_channels — 3 bit-exact passes over all 67 channels — and with
    # 64 feature channels the model never gathers at L1 (detector_1 runs
    # on the raw cloud, features=None).  That overstated the in-model cost
    # ~2.8x and sent VERDICT r3 chasing a 28 ms op that does not exist in
    # the step.  The rows below are the shapes the model actually runs.
    rec('knn_gather L1 rows65536 xyz-only (in-model)',
        timeit(scalarize(lambda d, i: knn_gather(d, i, exact_channels=3)),
               pts, idx))
    rec('knn_gather 65536rows x 67ch ex3 (synthetic)',
        timeit(scalarize(lambda d, i: knn_gather(d, i, exact_channels=3)),
               data67, idx))
    kp2 = pts[:, :512]
    idx2 = knn(kp2, kp, 32)[1]
    data67_l2 = jnp.concatenate([kp, feats64[:, :1024]], axis=-1)
    rec('knn_gather L2 rows16384 x 67ch (in-model)',
        timeit(scalarize(lambda d, i: knn_gather(d, i, exact_channels=3)),
               data67_l2, idx2))
    rec('knn_group L1 feat=None (in-model)',
        timeit(scalarize(lambda a, b: knn_group(a, b, None, 64)[0]),
               kp, pts))
    rec('knn_group L2 (in-model: knn + fused 67ch gather)',
        timeit(scalarize(lambda a, b, f: knn_group(a, b, f, 32)[0]),
               kp2, kp, feats64[:, :1024]))
    rec('cpe_neighbors N1024 k8',
        timeit(scalarize(lambda p: cpe_neighbors(p)[1]), kp))

    # ---- model prefixes ---------------------------------------------------
    cfg = experiment('reg_v11')
    ds_cfg = dataclasses.replace(cfg.data, dataset='synthetic', batch_size=B)
    cfg = dataclasses.replace(cfg, data=ds_cfg)
    model = build('model_v6')
    variables = jax.jit(lambda s, d: model.init(jax.random.PRNGKey(1), s, d,
                                                train=False))(pts, pts2)

    from pcd_reg_hregnet_tpu.models.registration import HierFeatureExtraction
    feat_net = HierFeatureExtraction(cfg.model)
    fv = jax.jit(lambda s: feat_net.init(jax.random.PRNGKey(1), s,
                                         train=False))(pts)
    rec('feature tower (1 cloud, 3 levels)',
        timeit(scalarize(lambda s: feat_net.apply(fv, s, train=False)), pts))

    rec('full forward model_v6 (2 towers + reg)',
        timeit(scalarize(lambda s, d: model.apply(variables, s, d,
                                                  train=False)), pts, pts2))

    # bf16 forward at matched params: the VERDICT r3 #6 probe (bf16 went
    # from +5% to -3% vs f32 across r2->r3; record where it stands now)
    model_bf = build('model_v6', compute_dtype='bfloat16')
    rec('full forward model_v6 (bfloat16)',
        timeit(scalarize(lambda s, d: model_bf.apply(variables, s, d,
                                                     train=False)), pts, pts2))

    # ---- train step -------------------------------------------------------
    ds = load_dataset(ds_cfg, 'train', length=B)
    batch = next(batch_iterator(ds, B))
    mesh = make_mesh(1)
    for dtype in ('float32', 'bfloat16'):
        c = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, compute_dtype=dtype))
        obj = RegistrationObjective(c)
        state, tx = create_state(c, obj, batch, 100)
        step = make_train_step(obj, tx, mesh)
        sb = shard_batch(batch, mesh)
        state, m = step(state, sb)          # compile
        np.asarray(m['loss'])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = step(state, sb)
        np.asarray(m['loss'])
        rec(f'train step ({dtype})',
            (time.perf_counter() - t0) / ITERS * 1e3)

    # grad-only (no optimizer/BN-update): isolates AdamW + state plumbing
    obj = RegistrationObjective(cfg)
    state, tx = create_state(cfg, obj, batch, 100)
    sb = shard_batch(batch, mesh)

    @jax.jit
    def grad_only(params, bs, b):
        def loss_fn(p):
            (loss, _, _), _ = obj.apply({'params': p, 'batch_stats': bs}, b,
                                        train=True, mutable=['batch_stats'])
            return loss
        g = jax.grad(loss_fn)(params)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    rec('objective grad only (fwd+bwd)',
        timeit(grad_only, state.params, state.batch_stats, sb))

    # ---- write markdown ---------------------------------------------------
    train_ms = dict(rows).get('train step (float32)', 1.0)
    os.makedirs('results', exist_ok=True)
    with open('results/profile_r4.md', 'w') as f:
        f.write('# Round-3 per-component time breakdown (B=8, N=8096, one '
                f'v5e chip via tunnel)\n\n'
                f'Backend: {jax.default_backend()}; iters={ITERS}; every '
                'timed fn reduces to one scalar (no DCE).\n\n'
                '| component | ms | % of f32 train step |\n|---|---|---|\n')
        for name, ms in rows:
            f.write(f'| {name} | {ms:.3f} | {100 * ms / train_ms:.1f}% |\n')
    print('\nwrote results/profile_r4.md')
    return 0


if __name__ == '__main__':
    sys.exit(main())
