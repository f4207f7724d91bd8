"""TPU-compiled kernel regression check (VERDICT r1 next-step #10).

The CPU test suite exercises Pallas kernels in interpret mode only; this
script runs the COMPILED TPU paths at production shapes and asserts
equality against the XLA reference implementations:

  * Pallas FPS / weighted FPS  vs  XLA fori_loop FPS   (exact index match)
  * Pallas fused patch attention vs dense XLA einsum   (tolerance)
  * one-hot / blocked MXU gathers vs take_along_axis   (bit-exact)
  * approx kNN recall vs exact two-stage top-k         (>= 0.9 target)

Run on the TPU chip (one JAX process at a time):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/check_kernels.py
Prints one PASS/FAIL line per check + a final JSON summary; exit code 1
on any failure.
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = {}


def check(name, ok, detail=''):
    RESULTS[name] = bool(ok)
    print(f'{"PASS" if ok else "FAIL"} {name} {detail}')


def main() -> int:
    backend = jax.default_backend()
    print(f'backend: {backend}')

    from pcd_reg_hregnet_tpu.ops import neighbors, sampling
    from pcd_reg_hregnet_tpu.ops.sampling import set_fps_impl

    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (4, 8096, 3), minval=-40.0, maxval=40.0)
    weights = jax.random.uniform(jax.random.fold_in(key, 1), (4, 8096)) + 0.1

    # --- FPS: pallas vs xla, production shape -----------------------------
    set_fps_impl('xla')
    idx_xla = np.asarray(sampling.fps(xyz, 1024))
    widx_xla = np.asarray(sampling.weighted_fps(xyz, weights, 1024))
    set_fps_impl('pallas')
    idx_pl = np.asarray(sampling.fps(xyz, 1024))
    widx_pl = np.asarray(sampling.weighted_fps(xyz, weights, 1024))
    set_fps_impl('auto')
    check('fps_pallas_vs_xla', np.array_equal(idx_xla, idx_pl),
          f'mismatches={int((idx_xla != idx_pl).sum())}')
    check('wfps_pallas_vs_xla', np.array_equal(widx_xla, widx_pl),
          f'mismatches={int((widx_xla != widx_pl).sum())}')

    # --- gathers: accelerator paths bit-exact vs taa ----------------------
    # 60 m-scale values: bf16 rounding inside a default-precision MXU
    # matmul would show as ~0.12 absolute error here (precision_probe.json)
    # — the 3-way bf16-split gather must be bit-exact anyway
    data = 60.0 * jax.random.normal(jax.random.fold_in(key, 2), (4, 8096, 64))
    gidx = jax.random.randint(jax.random.fold_in(key, 3), (4, 1024, 16), 0, 8096)
    neighbors.set_gather_impl('taa')
    ref = np.asarray(neighbors.knn_gather(data, gidx))
    for impl in ('onehot', 'blocked'):
        neighbors.set_gather_impl(impl)
        got = np.asarray(neighbors.knn_gather(data, gidx))
        check(f'gather_{impl}_bitexact', np.array_equal(ref, got))
    neighbors.set_gather_impl('auto')

    # --- patch attention: pallas vs dense XLA at production sizes ---------
    from pcd_reg_hregnet_tpu.ops.pallas.attention import patch_attention
    for K, H, d in ((256, 2, 32), (128, 4, 32), (64, 8, 32)):
        R = 8 * (1024 // K) if K <= 1024 else 8
        q, k_, v = (jax.random.normal(jax.random.fold_in(key, 10 + i),
                                      (R, H, K, d)) for i in range(3))
        scale = d ** -0.5
        # full-f32 reference; the kernel (like flash-attn) computes at
        # native MXU operand precision (~bf16, 2^-9 relative), so the
        # tolerance is bf16-scale on O(1) attention outputs
        dense = jax.nn.softmax(
            jnp.einsum('rhkd,rhmd->rhkm', q * scale, k_,
                       precision='highest'), axis=-1)
        want = np.asarray(jnp.einsum('rhkm,rhmd->rhkd', dense, v,
                                     precision='highest'))
        got = np.asarray(patch_attention(q, k_, v, scale))
        err = float(np.abs(got - want).max())
        check(f'pallas_attention_K{K}', err < 2e-2, f'max_err={err:.2e}')

    # --- approx kNN recall vs exact ----------------------------------------
    q = jax.random.uniform(jax.random.fold_in(key, 20), (2, 1024, 3)) * 40
    db = jax.random.uniform(jax.random.fold_in(key, 21), (2, 8096, 3)) * 40
    _, idx_exact = neighbors.knn(q, db, 16, approx=False)
    _, idx_approx = neighbors.knn(q, db, 16, approx=True)
    ex, ap = np.asarray(idx_exact), np.asarray(idx_approx)
    hits = sum(len(set(ex[b, i]) & set(ap[b, i]))
               for b in range(2) for i in range(0, 1024, 7))
    total = 16 * len(range(0, 1024, 7)) * 2
    recall = hits / total
    check('approx_knn_recall_ge_0.9', recall >= 0.9, f'recall={recall:.3f}')

    ok = all(RESULTS.values())
    print(json.dumps({'metric': 'tpu_kernel_regression', 'backend': backend,
                      'checks': RESULTS, 'ok': ok}))
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
