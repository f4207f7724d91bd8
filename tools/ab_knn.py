"""A/B: approximate (PartialReduce) vs exact kNN, end to end.

VERDICT r1 next-step #5: `ops/neighbors.knn` defaults to
`jax.lax.approx_min_k` for N >= 1024 — which includes the level-1 FineReg
whose correspondences feed the final pose.  This script measures the
actual accuracy cost on a trained checkpoint: evaluates the test split
twice (knn policy 'auto' = approx at large N, then 'exact'), reporting
dRRE / dRTE / rot/trans MAE deltas and forward throughput for both.

    python tools/ab_knn.py runs/v11_r2/ckpt/best_rre [--experiment reg_v11]

Writes the table into results/ab_knn.json and prints it.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('ckpt')
    ap.add_argument('--experiment', default='reg_v11')
    ap.add_argument('--batch-size', type=int, default=8)
    ap.add_argument('--out', default='results/ab_knn.json')
    args = ap.parse_args()

    import jax
    import numpy as np
    from pcd_reg_hregnet_tpu.data import batch_iterator, load_dataset
    from pcd_reg_hregnet_tpu.eval.runner import evaluate
    from pcd_reg_hregnet_tpu.ops.neighbors import set_knn_policy
    from pcd_reg_hregnet_tpu.train import experiment
    from pcd_reg_hregnet_tpu.train.loop import (create_state,
                                                restore_checkpoint)
    from pcd_reg_hregnet_tpu.train.objective import RegistrationObjective

    cfg = experiment(args.experiment)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, dataset='synthetic', batch_size=args.batch_size))
    ds = load_dataset(cfg.data, 'test')
    sample = next(batch_iterator(ds, cfg.data.batch_size, drop_last=False))
    objective = RegistrationObjective(cfg)
    state, _ = create_state(cfg, objective, sample, 1)
    state = restore_checkpoint(args.ckpt, state)

    report = {}
    batch = {k: np.asarray(v) for k, v in sample.items()}
    for policy in ('auto', 'exact'):
        set_knn_policy(policy)
        # accuracy: full test-split eval (compile time NOT counted anywhere)
        out = evaluate(cfg, state, dataset=ds)
        s = out['summary']
        report[policy] = {k: round(float(v), 5) for k, v in s.items()}
        # throughput: steady-state forward, compile excluded (VERDICT r3 #5
        # — the r3 numbers mixed ~30 s of compile into one 105-134 s eval
        # wall time, swamping the per-batch difference)
        import jax.numpy as jnp

        def fwd(params_bs, b):
            _, _, ret = objective.apply(params_bs, b, train=False)
            # reduce to one scalar: slices/dicts let XLA DCE the work
            return ret['rotation'][-1].sum() + ret['translation'][-1].sum()

        fwd_j = jax.jit(fwd)
        # device-resident once: host numpy params re-upload through the
        # tunnel on EVERY call otherwise (measured 1.1 s/call of pure
        # transfer), and np.asarray is the only reliable sync on axon
        pb = jax.tree.map(jnp.asarray,
                          {'params': state.params,
                           'batch_stats': state.batch_stats})
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        np.asarray(fwd_j(pb, jb))                  # compile + warm + sync
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fwd_j(pb, jb)
        np.asarray(r)
        dt = time.perf_counter() - t0
        report[policy]['fwd_ms_per_batch'] = round(1e3 * dt / reps, 3)
        report[policy]['fwd_pairs_per_s'] = round(
            args.batch_size * reps / dt, 1)
        print(policy, json.dumps(report[policy]))
    set_knn_policy('auto')

    report['delta'] = {
        k: round(report['auto'][k] - report['exact'][k], 5)
        for k in ('rre_deg', 'rte_m', 'rot_mae_deg', 'trans_mae_m')}
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    json.dump(report, open(args.out, 'w'), indent=2)
    print('delta (auto - exact):', json.dumps(report['delta']))
    return 0


if __name__ == '__main__':
    sys.exit(main())
