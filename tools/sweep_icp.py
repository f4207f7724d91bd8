"""ICP refinement sweep on the synthetic test split (VERDICT r3 #2).

Round 3 showed fixed-threshold ICP (thr 1.0, 30 iters) DEGRADES the
flagship's layer-2 pose (rre 0.118->0.175 deg).  `eval/icp.py` now anneals
the correspondence threshold and trust-tests the refined pose per item;
this sweep measures RRE/RTE of network-pose vs network+ICP across
(threshold_end, iters) for both methods, to pick + document the defaults.

    python tools/sweep_icp.py runs/r3_v11_knn/ckpt/best_rre

Writes results/icp_sweep.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('ckpt')
    ap.add_argument('--experiment', default='reg_v11')
    ap.add_argument('--batch-size', type=int, default=8)
    ap.add_argument('--max-batches', type=int, default=16,
                    help='sweep subset size (full eval runs use eval CLI)')
    ap.add_argument('--npoints', type=int, default=None)
    ap.add_argument('--out', default='results/icp_sweep.json')
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np
    from pcd_reg_hregnet_tpu.data import batch_iterator, load_dataset
    from pcd_reg_hregnet_tpu.eval.calib_eval import CalibEval
    from pcd_reg_hregnet_tpu.eval.icp import (estimate_normals,
                                              icp_point_to_plane,
                                              icp_point_to_point)
    from pcd_reg_hregnet_tpu.geometry import se3
    from pcd_reg_hregnet_tpu.train import experiment
    from pcd_reg_hregnet_tpu.train.loop import (create_state, make_eval_step,
                                                restore_checkpoint)
    from pcd_reg_hregnet_tpu.train.objective import RegistrationObjective
    from pcd_reg_hregnet_tpu.parallel.mesh import make_mesh

    cfg = experiment(args.experiment)
    # architecture comes from the checkpoint itself (cli._ckpt_model_config
    # semantics): the sweep works on any saved run without re-passing flags
    from pcd_reg_hregnet_tpu.cli import _ckpt_model_config
    mc = _ckpt_model_config(args.ckpt)
    if mc is not None:
        cfg = dataclasses.replace(cfg, model=mc)
    data_over = dict(dataset='synthetic', batch_size=args.batch_size)
    if args.npoints is not None:
        data_over['pcd_min_samples'] = args.npoints
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, **data_over))
    ds = load_dataset(cfg.data, 'test')
    sample = next(batch_iterator(ds, cfg.data.batch_size, drop_last=False))
    objective = RegistrationObjective(cfg)
    state, _ = create_state(cfg, objective, sample, 1)
    state = restore_checkpoint(args.ckpt, state)
    mesh = make_mesh(1, 'data')
    eval_step = make_eval_step(objective, mesh)

    grid = [(m, thr_end, iters, margin)
            for m in ('point_to_point', 'point_to_plane')
            for thr_end in (0.05, 0.1, 0.2)
            for iters in (30, 60)
            for margin in (0.95, 0.7, 0.5, 0.3)]
    evs = {k: CalibEval() for k in ['net'] + [f'{m}_t{t}_i{i}_m{g}'
                                             for m, t, i, g in grid]}

    nb = 0
    for batch in batch_iterator(ds, args.batch_size, drop_last=True):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, (R, t) = eval_step(state, jb)
        net_T = np.asarray(se3.pack(R, t))
        igt = batch['igt']
        evs['net'].add_batch(igt, net_T)
        src, dst = jb['uncalibed_pcd'], jb['pcd_left']
        normals = estimate_normals(dst)
        for m, thr_end, iters, margin in grid:
            if m == 'point_to_point':
                T = icp_point_to_point(src, dst, jnp.asarray(net_T), 1.0,
                                       iters, thr_end, margin)
            else:
                T = icp_point_to_plane(src, dst, normals, jnp.asarray(net_T),
                                       1.0, iters, thr_end, margin)
            evs[f'{m}_t{thr_end}_i{iters}_m{margin}'].add_batch(
                igt, np.asarray(T))
        nb += 1
        if nb >= args.max_batches:
            break

    report = {name: {k: round(v, 5) for k, v in ev.summary().items()
                     if k in ('rre_deg', 'rre_sd', 'rre_p95',
                              'rte_m', 'rte_sd', 'rte_p95')}
              for name, ev in evs.items()}
    report['_meta'] = {'ckpt': args.ckpt, 'pairs': nb * args.batch_size,
                       'threshold_start': 1.0}
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    json.dump(report, open(args.out, 'w'), indent=2)
    for name in report:
        if not name.startswith('_'):
            print(name, json.dumps(report[name]))
    return 0


if __name__ == '__main__':
    sys.exit(main())
