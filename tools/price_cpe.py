"""Price the PTv3 CPE variants: throughput of knn / curve / none.

VERDICT r3 #4b: the accuracy-motivated flip to `ptv3_cpe='knn'` was never
priced (inference regressed 569 -> 317 pairs/s across r2 -> r3 with no
recorded attribution).  This measures, at production shapes (B=8,
N=8096), steady-state compile-excluded forward throughput and train-step
time for each CPE, plus the conv (reg_v0) baseline for context.
Accuracy columns come from the matched 100-epoch arms
(results/v11_r4_eval.json / _curve_eval / _none_eval) — joined in the
README table, not here.

Writes results/price_cpe.json (and prints one row per variant).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

B = 8
N = 8096
ITERS = 10


def main() -> int:
    from pcd_reg_hregnet_tpu.data import batch_iterator, load_dataset
    from pcd_reg_hregnet_tpu.models import build
    from pcd_reg_hregnet_tpu.parallel.mesh import make_mesh, shard_batch
    from pcd_reg_hregnet_tpu.train import experiment
    from pcd_reg_hregnet_tpu.train.loop import create_state, make_train_step
    from pcd_reg_hregnet_tpu.train.objective import RegistrationObjective

    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (B, N, 3), minval=-60., maxval=60.)
    dst = jax.random.uniform(jax.random.fold_in(key, 1), (B, N, 3),
                             minval=-60., maxval=60.)

    variants = [('knn', 'model_v6', dict(ptv3_cpe='knn')),
                ('knn_fused_train', 'model_v6',
                 dict(ptv3_cpe='knn', fuse_towers_train=True)),
                ('curve', 'model_v6', dict(ptv3_cpe='curve')),
                ('none', 'model_v6', dict(ptv3_cpe='none')),
                ('conv_v0', 'hregnet', {})]

    cfg0 = experiment('reg_v11')
    ds_cfg = dataclasses.replace(cfg0.data, dataset='synthetic', batch_size=B)
    ds = load_dataset(ds_cfg, 'train', length=B)
    batch = next(batch_iterator(ds, B))
    mesh = make_mesh(1)

    report = {}
    for name, model_name, model_over in variants:
        model = build(model_name, **model_over)
        variables = jax.jit(lambda s, d, m=model: m.init(
            jax.random.PRNGKey(1), s, d, train=False))(src, dst)

        def fwd(v, s, d, m=model):
            out = m.apply(v, s, d, train=False)
            return out['rotation'][-1].sum() + out['translation'][-1].sum()

        fj = jax.jit(fwd)
        np.asarray(fj(variables, src, dst))          # compile + sync
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = fj(variables, src, dst)
        np.asarray(r)
        fwd_ms = (time.perf_counter() - t0) / ITERS * 1e3

        exp = 'reg_v11' if model_name == 'model_v6' else 'reg_v0'
        cfg = experiment(exp)
        cfg = dataclasses.replace(
            cfg, data=ds_cfg,
            model=dataclasses.replace(cfg.model, **model_over))
        obj = RegistrationObjective(cfg)
        state, tx = create_state(cfg, obj, batch, 100)
        step = make_train_step(obj, tx, mesh)
        sb = shard_batch(batch, mesh)
        state, m = step(state, sb)
        np.asarray(m['loss'])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = step(state, sb)
        np.asarray(m['loss'])
        train_ms = (time.perf_counter() - t0) / ITERS * 1e3

        report[name] = {
            'fwd_ms': round(fwd_ms, 2),
            'fwd_pairs_per_s': round(B / fwd_ms * 1e3, 1),
            'train_step_ms': round(train_ms, 2),
            'train_pairs_per_s': round(B / train_ms * 1e3, 1)}
        print(name, json.dumps(report[name]), flush=True)

    os.makedirs('results', exist_ok=True)
    json.dump(report, open('results/price_cpe.json', 'w'), indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
