"""Bisect the backward-pass blowup: grad cost per model prefix."""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def ptime(name, f, *a, n=6):
    # reduce to ONE scalar so the np.asarray readback really syncs (a dict
    # readback does not — np.asarray(dict) builds an object array without
    # waiting on the device arrays)
    g = jax.jit(lambda *aa: sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(f(*aa))))
    np.asarray(g(*a))
    t0 = time.perf_counter()
    rs = [g(*a) for _ in range(n)]
    np.asarray(rs[-1])
    print(f'{name:<34}{(time.perf_counter() - t0) / n * 1000:8.2f} ms', flush=True)


def main():
    B = 8
    from pcd_reg_hregnet_tpu.models import build
    model = build('model_v6')
    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (B, 8096, 3), minval=-40., maxval=40.)
    dst = jax.random.uniform(jax.random.fold_in(key, 1), (B, 8096, 3), minval=-40., maxval=40.)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(1), src[:1], dst[:1])
    params = variables['params']
    stats = {'batch_stats': variables['batch_stats']}

    def apply_train(p, pick):
        out, _ = model.apply({'params': p, **stats}, src, dst, train=True,
                             mutable=['batch_stats'])
        return jnp.sum(pick(out).astype(jnp.float32))

    def apply_eval(p, pick):
        out = model.apply({'params': p, **stats}, src, dst, train=False)
        return jnp.sum(pick(out).astype(jnp.float32))

    picks = [
        ('towers', lambda o: o['src_feats']['desc_3'] + o['dst_feats']['desc_3']),
        ('L1 det only', lambda o: o['src_feats']['sigmas_1']),
        ('desc_1', lambda o: o['src_feats']['desc_1']),
        ('coarse (R3)', lambda o: o['rotation'][0]),
        ('fine2 (R2)', lambda o: o['rotation'][1]),
        ('full (R1)', lambda o: o['rotation'][2]),
    ]
    for name, pick in picks:
        ptime(f'grad eval-mode {name}', lambda p, pk=pick: jax.grad(apply_eval)(p, pk), params)
    for name, pick in picks[-1:]:
        ptime(f'grad train-mode {name}', lambda p, pk=pick: jax.grad(apply_train)(p, pk), params)


if __name__ == '__main__':
    main()
