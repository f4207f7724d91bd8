"""Round-5 bench A/B (VERDICT r4 weak #1 + next-step #1a/#9).

BENCH_r04.json recorded 99.1 fwd pairs/s / 40.0 train pairs/s — 3x below
r3 (317 / 136.8) with an unchanged bench config.  The only r4 change on
bench's measured f32 forward path is the fused 2B eval tower; the train
step did not change at all.  This script A/Bs every candidate in ONE
session, each arm as median-of-3 timing windows with spread, so a real
code regression separates from tunnel/environment variance.

Arms:
  fwd_f32_fused    — bench.py's exact forward config (r4 default)
  fwd_f32_unfused  — r3's forward config (two sequential tower calls)
  fwd_bf16_fused   — bf16 compute + bf16 frozen-affine eval norms
  fwd_f32_bs1      — reference-recipe bs=1 forward (the measured
                     `vs_baseline` denominator, VERDICT #9)
  train_f32        — reg_v11 train step (fwd+bwd+AdamW), unchanged in r4

Writes results/ab_bench_r5.json and prints the table.
"""
from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

WINDOWS = 3
ITERS = 30
N_POINTS = 8096


def rate_windows(fn, batch, *args):
    """Median-of-WINDOWS pairs/s + spread ((max-min)/median of window rates)."""
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])   # compile + sync
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        out = [fn(*args) for _ in range(ITERS)]
        np.asarray(jax.tree_util.tree_leaves(out[-1])[0])
        rates.append(batch * ITERS / (time.perf_counter() - t0))
    rates.sort()
    med = rates[len(rates) // 2]
    return {'pairs_per_sec': round(med, 2),
            'spread': round((rates[-1] - rates[0]) / med, 4),
            'windows': [round(r, 2) for r in rates]}


def forward_arm(batch, dtype, fused):
    import dataclasses
    from pcd_reg_hregnet_tpu.models import build
    model = build('model_v6', compute_dtype=dtype)
    model = dataclasses.replace(
        model, cfg=dataclasses.replace(model.cfg, fuse_towers_eval=fused))
    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (batch, N_POINTS, 3), minval=-40., maxval=40.)
    dst = jax.random.uniform(jax.random.fold_in(key, 1), (batch, N_POINTS, 3),
                             minval=-40., maxval=40.)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(1), src, dst)

    @jax.jit
    def forward(s, d):
        out = model.apply(variables, s, d, train=False)
        return out['rotation'][-1].sum() + out['translation'][-1].sum()

    return rate_windows(forward, batch, src, dst)


def train_arm(batch):
    import dataclasses
    from pcd_reg_hregnet_tpu.data import batch_iterator, load_dataset
    from pcd_reg_hregnet_tpu.parallel.mesh import make_mesh, shard_batch
    from pcd_reg_hregnet_tpu.train import experiment
    from pcd_reg_hregnet_tpu.train.loop import create_state, make_train_step
    from pcd_reg_hregnet_tpu.train.objective import RegistrationObjective

    cfg = experiment('reg_v11')
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, dataset='synthetic', batch_size=batch))
    ds = load_dataset(cfg.data, 'train', length=batch)
    b = next(batch_iterator(ds, batch))
    mesh = make_mesh(1)
    objective = RegistrationObjective(cfg)
    state, tx = create_state(cfg, objective, b, steps_per_epoch=100)
    step = make_train_step(objective, tx, mesh)
    sb = shard_batch(b, mesh)

    holder = {'state': state}

    def train_once():
        new_state, metrics = step(holder['state'], sb)
        holder['state'] = new_state
        return metrics['loss']

    return rate_windows(train_once, batch)


def main():
    out = {'backend': jax.default_backend(),
           'device': str(jax.devices()[0]),
           'windows': WINDOWS, 'iters': ITERS}
    for name, fn in [
        ('fwd_f32_fused', lambda: forward_arm(8, 'float32', True)),
        ('fwd_f32_unfused', lambda: forward_arm(8, 'float32', False)),
        ('fwd_bf16_fused', lambda: forward_arm(8, 'bfloat16', True)),
        ('fwd_f32_bs1', lambda: forward_arm(1, 'float32', False)),
        ('train_f32', lambda: train_arm(8)),
    ]:
        out[name] = fn()
        print(f'{name:18s} {out[name]["pairs_per_sec"]:8.2f} pairs/s  '
              f'spread {out[name]["spread"]:.3f}  windows {out[name]["windows"]}',
              flush=True)
    with open('results/ab_bench_r5.json', 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
