"""Registration-head stage profile + attention impl comparison."""
import os
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
    print(f'{name:<30}{dt:7.2f} ms', flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from pcd_reg_hregnet_tpu.models import build
    model = build('model_v6')
    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (B, 8096, 3), minval=-40., maxval=40.)
    dst = jax.random.uniform(jax.random.fold_in(key, 1), (B, 8096, 3), minval=-40., maxval=40.)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(1), src[:1], dst[:1])

    def run(tag, pick):
        ptime(tag, lambda s, d: pick(model.apply(variables, s, d, train=False)), src, dst)

    run('towers', lambda o: (o['src_feats']['desc_3'], o['dst_feats']['desc_3']))
    run('+coarse+svd (R3)', lambda o: o['rotation'][0])
    run('+fine2 (R2)', lambda o: o['rotation'][1])
    run('+fine1 (R1) = full', lambda o: o['rotation'][2])

    # attention impl comparison on the full model
    from pcd_reg_hregnet_tpu.models.ptv3 import set_attn_impl
    for impl in ('xla', 'pallas'):
        set_attn_impl(impl)
        run(f'full, attn={impl}', lambda o: o['rotation'][2])

    # train-step cost (grad + adamw update), reg_v11 recipe
    set_attn_impl('auto')
    import dataclasses
    from pcd_reg_hregnet_tpu.train import experiment
    from pcd_reg_hregnet_tpu.train.loop import create_state, make_train_step
    from pcd_reg_hregnet_tpu.train.objective import RegistrationObjective
    from pcd_reg_hregnet_tpu.parallel.mesh import make_mesh, shard_batch
    from pcd_reg_hregnet_tpu.geometry import se3

    cfg = experiment('reg_v11')
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, dataset='synthetic', batch_size=B))
    batch = {'uncalibed_pcd': np.asarray(src), 'pcd_left': np.asarray(dst),
             'igt': np.asarray(jnp.broadcast_to(jnp.eye(4), (B, 4, 4)))}
    obj = RegistrationObjective(cfg)
    mesh = make_mesh(1)
    state, tx = create_state(cfg, obj, batch, steps_per_epoch=100)
    step = make_train_step(obj, tx, mesh)
    sb = shard_batch(batch, mesh)
    state, m = step(state, sb)   # compile
    float(m['loss'])
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        state, m = step(state, sb)
    float(m['loss'])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f'{"train step (reg_v11)":<30}{dt:7.2f} ms  '
          f'({B / (dt / 1000):.1f} pairs/s)', flush=True)


if __name__ == '__main__':
    main()
