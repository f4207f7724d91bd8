"""Benchmark harness: registration throughput, train throughput, MFU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference publishes no throughput (its timing code is commented out,
`/root/reference/test/test_v3.py:116-126`), so `vs_baseline` is the
measured value divided by REFERENCE_PAIRS_PER_SEC_ESTIMATE — a
conservative envelope estimate for Model_V6 inference at bs=1 on the
reference's single GPU (dual 8096-point feature towers + PTv3 blocks);
the JSON carries `baseline_note` making the provenance explicit.

Extra fields (VERDICT r1 next-step #4):
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
                   # (B=4: 469, B=8: 553-585 run-to-run, B=16: 508, B=32: 478)
N_POINTS = 8096
ITERS = 40

# v5e peak: 197 TFLOP/s bf16; XLA runs f32 matmuls on the MXU at half
# that.  MFU below uses the dtype-matched peak.
PEAK_FLOPS = {'float32': 98.5e12, 'bfloat16': 197e12}


def _timeit(fn, *args, iters=ITERS):
    import numpy as np
    np.asarray(fn(*args))              # warmup/compile + real host sync
    t0 = time.perf_counter()
    out = [fn(*args) for _ in range(iters)]
    np.asarray(out[-1])
    return (time.perf_counter() - t0) / iters


def _flops_of(jitted, *args) -> float:
    """XLA-counted FLOPs of one call (0.0 when the backend won't say)."""
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get('flops', 0.0)) if an else 0.0
    except Exception:
        return 0.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pcd_reg_hregnet_tpu.models import build

    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (BATCH, N_POINTS, 3), minval=-40.0, maxval=40.0)
    dst = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, N_POINTS, 3),
                             minval=-40.0, maxval=40.0)

    def forward_rate(dtype):
        model = build('model_v6', compute_dtype=dtype)
        variables = jax.jit(partial(model.init, train=False))(
            jax.random.PRNGKey(1), src, dst)

        @jax.jit
        def forward(s, d):
            out = model.apply(variables, s, d, train=False)
            # reduce to one scalar over the WHOLE batch: an element slice
            # invites XLA to DCE the other batch items' work, a sum cannot
            return out['rotation'][-1].sum() + out['translation'][-1].sum()

        dt = _timeit(forward, src, dst)
        return BATCH / dt, _flops_of(forward, src, dst) / dt

    pairs_per_sec, fwd_flops_rate = forward_rate('float32')
    pairs_per_sec_bf16, _ = forward_rate('bfloat16')

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

    def train_once(s):
        new_s, metrics = step(s, sb)
        return new_s, metrics['loss']

    state, _ = train_once(state)       # warmup/compile
    np_ = np
    np_.asarray(_)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        state, loss = train_once(state)
    np_.asarray(loss)
    train_dt = (time.perf_counter() - t0) / iters
    train_pairs_per_sec = BATCH / train_dt

    peak = PEAK_FLOPS['float32']
    mfu = (train_flops / train_dt) / peak if train_flops else 0.0
    mfu_fwd = fwd_flops_rate / peak

    print(json.dumps({
        'metric': 'registration_pairs_per_sec_single_chip',
        'value': round(pairs_per_sec, 3),
        'unit': 'pairs/s',
        'vs_baseline': round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC_ESTIMATE, 3),
        'baseline_note': ('reference publishes no throughput; baseline is a '
                          '10 pairs/s single-GPU envelope estimate'),
        'pairs_per_sec_bf16': round(pairs_per_sec_bf16, 3),
        'train_pairs_per_sec': round(train_pairs_per_sec, 3),
        'train_step_ms': round(train_dt * 1e3, 2),
        'mfu': round(mfu, 4),
        'mfu_forward': round(mfu_fwd, 4),
        'batch': BATCH,
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
    import jax
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
