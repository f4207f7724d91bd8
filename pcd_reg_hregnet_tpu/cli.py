"""Command-line interface: train / evaluate / pretrain / bench.

Replaces the reference's 15 train scripts + 4 test scripts + shell
wrappers (`/root/reference/train/`, `test/`, `scripts/*.sh`) with one CLI
over the experiment registry:

    python -m pcd_reg_hregnet_tpu train --experiment reg_v11 --dataset man \
        --data-path /data/truckscenes --epochs 100
    python -m pcd_reg_hregnet_tpu eval  --experiment reg_v11 --ckpt runs/ckpt/best_rre \
        --icp point_to_plane --results results/results.json
    python -m pcd_reg_hregnet_tpu pretrain-feats --stage detector
    python -m pcd_reg_hregnet_tpu bench
"""
from __future__ import annotations

import argparse
import dataclasses
import sys


def _common(p: argparse.ArgumentParser) -> None:
    p.add_argument('--experiment', default='reg_v11',
                   help='named experiment preset (see train/experiments.py)')
    p.add_argument('--dataset', default=None, choices=['man', 'audi', 'synthetic'])
    p.add_argument('--data-path', default=None)
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--epochs', type=int, default=None)
    p.add_argument('--lr', type=float, default=None)
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--npoints', type=int, default=None)
    p.add_argument('--log-dir', default='runs')
    p.add_argument('--use-wandb', action='store_true')
    p.add_argument('--watch', action='store_true',
                   help='log per-module grad/param norms every epoch '
                        '(wandb.watch equivalent)')
    p.add_argument('--compute-dtype', default=None,
                   choices=['float32', 'bfloat16'],
                   help='activation dtype of the compute path (for this '
                        'model bfloat16 is mainly an activation-memory '
                        'knob — the hot spots are gathers and sampling, '
                        'not matmul throughput; see results/roofline_r4.md)')
    p.add_argument('--debug-scale', action='store_true',
                   help='shrink the keypoint pyramid (64/32/16 samples) and '
                        'PTv3 stack for CPU smoke runs / CI')
    p.add_argument('--ptv3-cpe', default=None, choices=['knn', 'curve', 'none'],
                   help='PTv3 positional-encoding operator (ablations)')
    p.add_argument('--ptv3-grid-size', type=float, default=None,
                   help='PTv3 serialization voxel size (ablations)')


def _ckpt_config(ckpt_path):
    """Full Config recorded in a checkpoint's meta.json, or None.

    Architecture flags are part of the parameter tree (e.g. a curve-CPE
    checkpoint will not restore under a knn-CPE config; an MI run's
    checkpoint carries the loss discriminators' params), so eval / infer /
    resume default the MODEL (and, for eval/infer, the LOSS) config from
    the checkpoint itself and let CLI flags override — instead of
    requiring the caller to reproduce every flag of the original run
    (ADVICE r3 medium).
    """
    import json
    import os
    if not ckpt_path:
        return None
    meta = os.path.join(ckpt_path, 'meta.json')
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        d = json.load(f)
    if 'config' not in d:
        return None
    from .core.config import Config
    return Config.from_json(d['config'])


def _ckpt_model_config(ckpt_path):
    cfg = _ckpt_config(ckpt_path)
    return None if cfg is None else cfg.model


def _build_config(args, model_base=None):
    from .train.experiments import experiment
    cfg = experiment(args.experiment)
    if model_base is not None:
        cfg = dataclasses.replace(cfg, model=model_base)
    data_over, train_over = {}, {}
    if args.dataset is not None:
        data_over['dataset'] = args.dataset
    if args.data_path is not None:
        data_over['path'] = args.data_path
    if args.batch_size is not None:
        data_over['batch_size'] = args.batch_size
    if args.npoints is not None:
        data_over['pcd_min_samples'] = args.npoints
    if args.epochs is not None:
        train_over['epochs'] = args.epochs
    if args.lr is not None:
        train_over['lr'] = args.lr
    if args.seed is not None:
        train_over['seed'] = args.seed
    if args.use_wandb:
        train_over['use_wandb'] = True
    if getattr(args, 'watch', False):
        train_over['watch'] = True
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, **data_over),
        train=dataclasses.replace(cfg.train, **train_over))
    if getattr(args, 'compute_dtype', None) is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           compute_dtype=args.compute_dtype))
    if getattr(args, 'ptv3_cpe', None) is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, ptv3_cpe=args.ptv3_cpe))
    if getattr(args, 'ptv3_grid_size', None) is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           ptv3_grid_size=args.ptv3_grid_size))
    if getattr(args, 'debug_scale', False):
        from .core.config import LevelConfig
        model_over = dict(levels=(LevelConfig(64, 16, (16, 16, 32), 32),
                                  LevelConfig(32, 8, (32, 32, 64), 64),
                                  LevelConfig(16, 8, (64, 64, 128), 128)))
        if cfg.model.backbone == 'ptv3':
            model_over.update(ptv3_patch_sizes=(16, 16, 16), ptv3_depths=(1,),
                              ptv3_num_heads=(2,))
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_over))
    return cfg


def main(argv=None) -> int:
    parser = argparse.ArgumentParser('pcd_reg_hregnet_tpu')
    sub = parser.add_subparsers(dest='cmd', required=True)

    p_train = sub.add_parser('train', help='train a registration experiment')
    _common(p_train)
    p_train.add_argument('--max-steps', type=int, default=None)
    p_train.add_argument('--pretrain-feats', default=None,
                         help='feature-pretrain checkpoint to warm-start the '
                              'backbone (reference --pretrain_backbone_feats)')
    p_train.add_argument('--resume', default=None,
                         help='full checkpoint (params+optimizer) to resume from')

    p_eval = sub.add_parser('eval', help='evaluate on the test split')
    _common(p_eval)
    p_eval.add_argument('--ckpt', default=None,
                        help='required unless --icp-only')
    p_eval.add_argument('--icp', default=None,
                        choices=['point_to_point', 'point_to_plane'])
    p_eval.add_argument('--icp-only', action='store_true',
                        help='classical ICP from identity, no network '
                             '(reference README ICP-only rows)')
    p_eval.add_argument('--icp-iters', type=int, default=None)
    p_eval.add_argument('--seq-parallel', type=int, default=0,
                        help='shard the PTv3 serialized point axis over N '
                             'devices (GSPMD sequence parallelism; results '
                             'identical to the unsharded path)')
    p_eval.add_argument('--results', default='results/results.json')

    p_feats = sub.add_parser('pretrain-feats', help='detector/descriptor pretrain')
    _common(p_feats)
    p_feats.add_argument('--stage', default='detector',
                         choices=['detector', 'descriptor'])
    p_feats.add_argument('--pretrain-detector', default=None)

    # single-pair serving entry (the reference buries this flow in its
    # visualize/test scripts; here it is a first-class deployable command)
    p_inf = sub.add_parser('infer', help='register one source cloud onto a '
                                         'target cloud')
    _common(p_inf)
    p_inf.add_argument('--ckpt', required=True)
    p_inf.add_argument('--src', required=True,
                       help='source cloud (.pcd.bin/.bin, .npy, or .npz)')
    p_inf.add_argument('--dst', required=True, help='target cloud')
    p_inf.add_argument('--icp', default=None,
                       choices=['point_to_point', 'point_to_plane'])
    p_inf.add_argument('--out', default=None, help='write the pose JSON here')

    p_bench = sub.add_parser('bench', help='single-chip throughput benchmark')

    # the reference's standalone plot scripts (visualize/visualize_results.py
    # __main__) as a subcommand over an eval results JSON
    p_vis = sub.add_parser('visualize', help='plot suite from eval results JSON')
    p_vis.add_argument('--results', required=True,
                       help='results JSON written by `eval --results ...`')
    p_vis.add_argument('--out', default='plots')
    p_vis.add_argument('--max-rot', type=float, default=2.0,
                       help='recall-curve rotation threshold sweep end [deg]')
    p_vis.add_argument('--max-trans', type=float, default=0.5,
                       help='recall-curve translation threshold sweep end [m]')

    args = parser.parse_args(argv)

    if args.cmd == 'train':
        import os
        from .train import fit
        from .train.loop import latest_checkpoint
        # a resumed run's model architecture comes from its checkpoint, so
        # '--resume auto' relaunches keep working even when defaults moved
        resume_path = args.resume
        if resume_path == 'auto':
            resume_path = latest_checkpoint(os.path.join(args.log_dir, 'ckpt'))
        cfg = _build_config(args, model_base=_ckpt_model_config(resume_path))
        _, val = fit(cfg, log_dir=args.log_dir, max_steps=args.max_steps,
                     pretrain_feats=args.pretrain_feats, resume=args.resume)
        print({k: round(v, 4) for k, v in val.items()})
        return 0

    if args.cmd == 'eval':
        import jax
        from .data import batch_iterator, load_dataset
        from .eval.runner import evaluate, evaluate_icp_only
        from .train.loop import create_state, restore_checkpoint
        from .train.objective import RegistrationObjective
        saved = _ckpt_config(args.ckpt)
        cfg = _build_config(args,
                            model_base=None if saved is None else saved.model)
        if saved is not None:
            # the loss config shapes the parameter tree too (MI runs train
            # discriminators); restore needs the checkpoint's own loss set
            cfg = dataclasses.replace(cfg, loss=saved.loss)
        ds = load_dataset(cfg.data, 'test')
        if args.icp_only:
            out = evaluate_icp_only(
                cfg, icp=args.icp or 'point_to_point',
                icp_iters=args.icp_iters or 100,
                results_path=args.results, dataset=ds)
            print(out['summary'])
            return 0
        if not args.ckpt:
            print('--ckpt is required unless --icp-only', file=sys.stderr)
            return 2
        sample = next(batch_iterator(ds, cfg.data.batch_size, drop_last=False))
        objective = RegistrationObjective(cfg)
        state, _ = create_state(cfg, objective, sample, 1)
        state = restore_checkpoint(args.ckpt, state)
        out = evaluate(cfg, state, icp=args.icp, results_path=args.results,
                       dataset=ds, seq_parallel=args.seq_parallel)
        print(out['summary'])
        return 0

    if args.cmd == 'infer':
        import json

        import numpy as np

        from .eval.runner import infer_pair
        from .train.loop import create_state, restore_checkpoint
        from .train.objective import RegistrationObjective

        def load_cloud(path):
            if path.endswith('.npy'):
                return np.load(path)
            if path.endswith('.npz'):
                arrs = np.load(path)
                key = 'points' if 'points' in arrs else list(arrs)[0]
                return arrs[key]
            from .data.truckscenes import load_lidar_bin
            return load_lidar_bin(path)[0]

        saved = _ckpt_config(args.ckpt)
        cfg = _build_config(args,
                            model_base=None if saved is None else saved.model)
        if saved is not None:
            cfg = dataclasses.replace(cfg, loss=saved.loss)
        src, dst = load_cloud(args.src), load_cloud(args.dst)
        n = cfg.data.pcd_min_samples
        sample = {'uncalibed_pcd': np.zeros((1, n, 3), np.float32),
                  'pcd_left': np.zeros((1, n, 3), np.float32),
                  'igt': np.eye(4, dtype=np.float32)[None]}
        objective = RegistrationObjective(cfg)
        state, _ = create_state(cfg, objective, sample, 1)
        state = restore_checkpoint(args.ckpt, state)
        out = infer_pair(cfg, state, src, dst, icp=args.icp)
        text = json.dumps(out, indent=1)
        if args.out:
            import os
            os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
            with open(args.out, 'w') as f:
                f.write(text)
        print(text)
        return 0

    if args.cmd == 'pretrain-feats':
        import dataclasses as _dc
        from .train.feats_loop import fit_feats
        cfg = _build_config(args)
        # reference pretrain recipe: Adam 1e-3, StepLR(10, 0.5)
        # (`train/train_feats.py:184-185`)
        cfg = _dc.replace(cfg, train=_dc.replace(
            cfg.train, optimizer='adam', schedule='step', lr=1e-3,
            freeze_detector=(args.stage == 'descriptor')))
        _, metrics = fit_feats(cfg, stage=args.stage,
                               pretrain_detector=args.pretrain_detector,
                               log_dir=args.log_dir)
        print({k: round(v, 4) for k, v in metrics.items()})
        return 0

    if args.cmd == 'bench':
        import runpy
        runpy.run_path('bench.py', run_name='__main__')
        return 0

    if args.cmd == 'visualize':
        import json
        from .utils.visualize import VisualizeResults
        with open(args.results) as f:
            res = json.load(f)
        layers = {k: v for k, v in sorted(res.items())
                  if k.startswith('layer_') and isinstance(v, dict)}
        if not layers:
            print(f'no layer_* entries in {args.results}', file=sys.stderr)
            return 1
        # numeric suffix sort: 'layer_10' outranks 'layer_9' (lexicographic
        # max would not — ADVICE r2)
        finest = layers[max(layers, key=lambda k: int(k.split('_')[-1]))]
        viz = VisualizeResults(args.out)
        paths = [viz.error_distributions(finest, 'finest'),
                 viz.box_plots(layers),
                 viz.recall_curve(finest, max_rot=args.max_rot,
                                  max_trans=args.max_trans)]
        if finest.get('rre'):
            paths.append(viz.rre_histogram(finest, 'finest'))
        print('\n'.join(paths))
        return 0

    return 1


if __name__ == '__main__':
    sys.exit(main())
