"""Microbench: fine-level kNN + FineReg-shaped stages (N=1024, k=8)."""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pcd_reg_hregnet_tpu.ops.neighbors import knn, knn_gather, pairwise_sqdist


def ptime(name, f, *a, n=40):
    g = jax.jit(lambda *aa: sum(jnp.sum(l.astype(jnp.float32))
                                for l in jax.tree_util.tree_leaves(f(*aa))))
    np.asarray(g(*a))
    t0 = time.perf_counter()
    rs = [g(*a) for _ in range(n)]
    np.asarray(rs[-1])
    print(f'{name:<34}{(time.perf_counter() - t0) / n * 1000:7.2f} ms', flush=True)


def main():
    B, N, k, C = 8, 1024, 8, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(key, (B, N, 3), minval=-40., maxval=40.)
    db = jax.random.uniform(jax.random.fold_in(key, 1), (B, N, 3), minval=-40., maxval=40.)
    feat = jax.random.normal(jax.random.fold_in(key, 2), (B, N, C))

    ptime('d2 1024x1024', pairwise_sqdist, q, db)
    ptime('knn auto (approx)', lambda a, b: knn(a, b, k)[1], q, db)
    ptime('knn exact (top_k)', lambda a, b: knn(a, b, k, approx=False)[1], q, db)

    def knn_binned(a, b, S=8):
        d2 = pairwise_sqdist(a, b)
        nb = d2.shape[-1] // S
        bm = d2.reshape(B, N, nb, S).min(-1)                 # bin minima
        _, bidx = jax.lax.top_k(-bm, k)                      # top-k bins (exact cover)
        cand = bidx[..., None] * S + jnp.arange(S)           # [B,N,k,S]
        cand = cand.reshape(B, N, k * S)
        cd = jnp.take_along_axis(d2, cand, axis=-1)          # [B,N,k*S]
        nd, jj = jax.lax.top_k(-cd, k)
        return jnp.take_along_axis(cand, jj, axis=-1)
    ptime('knn binned-exact S=8', knn_binned, q, db)
    ptime('knn binned-exact S=16', lambda a, b: knn_binned(a, b, 16), q, db)

    # verify binned == exact
    ei = np.asarray(knn(q, db, k, approx=False)[1])
    bi = np.asarray(jax.jit(knn_binned)(q, db))
    print('binned set-match frac:',
          np.mean([len(set(ei[b, m]) & set(bi[b, m])) / k
                   for b in range(2) for m in range(0, N, 37)]))

    # FineReg-ish downstream: fused gather + conv stack
    def downstream(a, b, f):
        _, idx = knn(a, b, k)
        g = knn_gather(jnp.concatenate([b, f], -1), idx)
        return g
    ptime('knn + fused gather (C=67)', downstream, q, db, feat)


if __name__ == '__main__':
    main()
