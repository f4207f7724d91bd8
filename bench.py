"""Benchmark harness: registration throughput, train throughput, MFU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Trustworthiness (VERDICT r4 weak #1 / next-step #1b): every rate is the
median of 3 independent timing windows; per-metric spread
((max-min)/median) is reported, and `unstable: true` is set (with a
stderr warning) when any spread exceeds 20% — so chip contention or
tunnel variance shows up as a flag instead of a silently wrong number
(BENCH_r04 was recorded while a training chain time-shared the chip).

`vs_baseline` (VERDICT r4 #9): the reference publishes no throughput
(its timing code is commented out, `/root/reference/test/test_v3.py:
116-126`) and its recipe is bs=1 (`scripts/train_man_registration.sh`),
so the denominator is the *measured in-session* bs=1 f32 forward — the
reference-recipe rate on this same chip; measured / measured.  The old
invented 10 pairs/s envelope is kept as `vs_envelope_estimate` for
cross-round continuity.

Extra fields:
  * `train_pairs_per_sec` — full reg_v11 train step (fwd+bwd+AdamW);
  * `mfu` — model FLOPs utilisation of the train step: XLA-counted
    FLOPs / wall time / chip peak (f32 peak on the MXU);
  * `pairs_per_sec_bf16` — forward with compute_dtype=bfloat16.

`python bench.py --scaling` instead runs the partitioned-HLO scaling
proxy (tools/scaling_proxy.py) on a virtual CPU mesh: per-device FLOPs
must scale ~1/N and gradient all-reduces must be present with an
N-independent count — the check that would actually catch a sharding
regression (virtual-device wall-clock on shared cores measures nothing;
BASELINE.md's >=80% multi-host target needs a real pod).
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

REFERENCE_PAIRS_PER_SEC_ESTIMATE = 10.0
BATCH = 8          # measured single-chip throughput sweet spot on v5e
N_POINTS = 8096
WINDOWS = 3
ITERS = 30
SPREAD_LIMIT = 0.20


def _rate_windows(fn, batch, *args):
    """Median-of-WINDOWS (pairs/s, spread) for a host-synced callable."""
    import numpy as np
    np.asarray(fn(*args))              # warmup/compile + real host sync
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        out = [fn(*args) for _ in range(ITERS)]
        np.asarray(out[-1])
        rates.append(batch * ITERS / (time.perf_counter() - t0))
    rates.sort()
    med = rates[len(rates) // 2]
    return med, (rates[-1] - rates[0]) / med


def _flops_of(jitted, *args) -> float:
    """XLA-counted FLOPs of one call (0.0 when the backend won't say)."""
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get('flops', 0.0)) if an else 0.0
    except Exception:
        return 0.0


# v5e peak: 197 TFLOP/s bf16; XLA runs f32 matmuls on the MXU at half
# that.  MFU below uses the dtype-matched peak.
PEAK_FLOPS = {'float32': 98.5e12, 'bfloat16': 197e12}


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pcd_reg_hregnet_tpu.models import build

    key = jax.random.PRNGKey(0)

    def make_clouds(batch):
        src = jax.random.uniform(key, (batch, N_POINTS, 3),
                                 minval=-40.0, maxval=40.0)
        dst = jax.random.uniform(jax.random.fold_in(key, 1),
                                 (batch, N_POINTS, 3),
                                 minval=-40.0, maxval=40.0)
        return src, dst

    def forward_rate(dtype, batch):
        model = build('model_v6', compute_dtype=dtype)
        src, dst = make_clouds(batch)
        variables = jax.jit(partial(model.init, train=False))(
            jax.random.PRNGKey(1), src, dst)

        @jax.jit
        def forward(s, d):
            out = model.apply(variables, s, d, train=False)
            # reduce to one scalar over the WHOLE batch: an element slice
            # invites XLA to DCE the other batch items' work, a sum cannot
            return out['rotation'][-1].sum() + out['translation'][-1].sum()

        rate, spread = _rate_windows(forward, batch, src, dst)
        return rate, spread, _flops_of(forward, src, dst) * rate / batch

    spreads = {}
    pairs_per_sec, spreads['forward'], fwd_flops_rate = forward_rate('float32', BATCH)
    pairs_per_sec_bf16, spreads['forward_bf16'], _ = forward_rate('bfloat16', BATCH)
    # measured vs_baseline denominator: the reference-recipe bs=1 forward
    bs1_rate, spreads['forward_bs1'], _ = forward_rate('float32', 1)

    # --- train step (reg_v11 recipe: fwd + bwd + AdamW/OneCycle) ----------
    from pcd_reg_hregnet_tpu.data import batch_iterator, load_dataset
    from pcd_reg_hregnet_tpu.parallel.mesh import make_mesh, shard_batch
    from pcd_reg_hregnet_tpu.train import experiment
    from pcd_reg_hregnet_tpu.train.loop import create_state, make_train_step
    from pcd_reg_hregnet_tpu.train.objective import RegistrationObjective
    import dataclasses

    cfg = experiment('reg_v11')
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, dataset='synthetic', batch_size=BATCH))
    ds = load_dataset(cfg.data, 'train', length=BATCH)
    batch = next(batch_iterator(ds, BATCH))
    mesh = make_mesh(1)
    objective = RegistrationObjective(cfg)
    state, tx = create_state(cfg, objective, batch, steps_per_epoch=100)
    step = make_train_step(objective, tx, mesh)
    sb = shard_batch(batch, mesh)

    train_flops = _flops_of(step, state, sb)

    holder = {'state': state}

    def train_once():
        holder['state'], metrics = step(holder['state'], sb)
        return metrics['loss']

    train_pairs_per_sec, spreads['train'] = _rate_windows(train_once, BATCH)
    train_dt = BATCH / train_pairs_per_sec

    peak = PEAK_FLOPS['float32']
    mfu = (train_flops / train_dt) / peak if train_flops else 0.0
    mfu_fwd = fwd_flops_rate / peak

    unstable = {k: round(v, 4) for k, v in spreads.items() if v > SPREAD_LIMIT}
    if unstable:
        print(f'bench: UNSTABLE measurement, window spread >{SPREAD_LIMIT:.0%} '
              f'in {unstable} — another process is likely time-sharing the '
              f'chip; numbers below are the medians but should not be '
              f'compared across rounds', file=sys.stderr)

    print(json.dumps({
        'metric': 'registration_pairs_per_sec_single_chip',
        'value': round(pairs_per_sec, 3),
        'unit': 'pairs/s',
        'vs_baseline': round(pairs_per_sec / bs1_rate, 3),
        'baseline_note': ('measured/measured: denominator is the in-session '
                          'bs=1 f32 forward (reference recipe is bs=1; it '
                          'publishes no throughput of its own)'),
        'reference_bs1_pairs_per_sec': round(bs1_rate, 3),
        'vs_envelope_estimate': round(
            pairs_per_sec / REFERENCE_PAIRS_PER_SEC_ESTIMATE, 3),
        'pairs_per_sec_bf16': round(pairs_per_sec_bf16, 3),
        'train_pairs_per_sec': round(train_pairs_per_sec, 3),
        'train_step_ms': round(train_dt * 1e3, 2),
        'mfu': round(mfu, 4),
        'mfu_forward': round(mfu_fwd, 4),
        'batch': BATCH,
        'windows': WINDOWS,
        'iters_per_window': ITERS,
        'spread': {k: round(v, 4) for k, v in spreads.items()},
        'unstable': bool(unstable),
        'backend': __import__('jax').default_backend(),
    }))


def scaling() -> None:
    """Multi-device scaling proxy on the virtual CPU mesh.

    Delegates to tools/scaling_proxy.py (VERDICT r3 #5: wall-clock on
    virtual devices sharing 2 physical cores measures nothing): compiles
    the train step at mesh 1/2/4/8 with the SAME global batch and checks
    the partitioned HLO — per-device FLOPs must scale ~1/N and the
    gradient all-reduces must be present with an N-independent count.
    Prints one JSON line; also writes results/scaling_proxy.json."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'tools'))
    import scaling_proxy
    rc = scaling_proxy.main()
    if rc:
        raise SystemExit(rc)


if __name__ == '__main__':
    if '--scaling' in sys.argv:
        scaling()
    else:
        main()
