"""Per-stage wall-clock profile of the flagship model on the attached chip.

Usage: python tools/profile_model.py [batch]

Times cumulative prefixes of the model_v6 forward (detector L1, +PTv3,
levels 2/3, both towers, full registration) plus the individual hot ops
(FPS, kNN, gather, grouping).  Every timed function reduces its outputs
with a full sum so XLA cannot dead-code-eliminate the work being measured
(slicing one element lets the compiler skip most of a gather/matmul —
a trap we hit once).
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def ptime(name, f, *a, n=30):
    g = jax.jit(lambda *aa: sum(jnp.sum(l.astype(jnp.float32))
                                for l in jax.tree_util.tree_leaves(f(*aa))))
    np.asarray(g(*a))
    t0 = time.perf_counter()
    rs = [g(*a) for _ in range(n)]
    np.asarray(rs[-1])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f'{name:<28}{dt:7.2f} ms', flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N, M, K = 8096, 1024, 64
    from pcd_reg_hregnet_tpu.models import build
    from pcd_reg_hregnet_tpu.ops.neighbors import knn, knn_gather, knn_group, pairwise_sqdist
    from pcd_reg_hregnet_tpu.ops.sampling import fps, gather_points, weighted_fps

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (B, N, 3), minval=-40., maxval=40.)
    dst = jax.random.uniform(jax.random.fold_in(key, 1), (B, N, 3), minval=-40., maxval=40.)
    w = jax.random.uniform(jax.random.fold_in(key, 2), (B, N))
    q = gather_points(pts, fps(pts, M))
    idx = jnp.asarray(np.asarray(knn(q, pts, K)[1]))

    print(f'== ops (B={B}, N={N}, M={M}, k={K}) ==')
    ptime('fps', lambda p: fps(p, M), pts)
    ptime('weighted_fps', lambda p, ww: weighted_fps(p, ww, M), pts, w)
    ptime('pairwise_sqdist', pairwise_sqdist, q, pts)
    ptime('knn (approx)', lambda a, b: knn(a, b, K)[1], q, pts)
    ptime('knn_gather', knn_gather, pts, idx)
    ptime('knn_group', lambda a, b: knn_group(a, b, None, K), q, pts)

    print('== model_v6 cumulative ==')
    model = build('model_v6')
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(1), pts[:1], dst[:1])

    def run(tag, pick):
        ptime(tag, lambda s, d: pick(model.apply(variables, s, d, train=False)), pts, dst)

    S = lambda o: o['src_feats']
    run('L1 detector', lambda o: (S(o)['xyz_1'], S(o)['sigmas_1']))
    run('L1 +ptv3', lambda o: S(o)['desc_1'])
    run('thru L2', lambda o: S(o)['desc_2'])
    run('thru L3 (one tower)', lambda o: S(o)['desc_3'])
    run('both towers', lambda o: (S(o)['desc_3'], o['dst_feats']['desc_3']))
    run('full forward', lambda o: (o['rotation'][2], o['translation'][2]))


if __name__ == '__main__':
    main()
