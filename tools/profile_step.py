"""Isolate the train-step blowup: objective grad vs optimizer vs full step."""
import dataclasses
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def ptime(name, f, *a, n=5):
    g = jax.jit(lambda *aa: sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(f(*aa))))
    np.asarray(g(*a))
    t0 = time.perf_counter()
    rs = [g(*a) for _ in range(n)]
    np.asarray(rs[-1])
    print(f'{name:<34}{(time.perf_counter() - t0) / n * 1000:8.2f} ms', flush=True)


def main():
    B = 8
    from pcd_reg_hregnet_tpu.train import experiment
    from pcd_reg_hregnet_tpu.train.loop import create_state
    from pcd_reg_hregnet_tpu.train.objective import RegistrationObjective
    from pcd_reg_hregnet_tpu.train.optimizer import make_optimizer

    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (B, 8096, 3), minval=-40., maxval=40.)
    dst = jax.random.uniform(jax.random.fold_in(key, 1), (B, 8096, 3), minval=-40., maxval=40.)
    batch = {'uncalibed_pcd': np.asarray(src), 'pcd_left': np.asarray(dst),
             'igt': np.asarray(jnp.broadcast_to(jnp.eye(4), (B, 4, 4)))}

    cfg = experiment('reg_v11')
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, dataset='synthetic', batch_size=B))
    obj = RegistrationObjective(cfg)
    state, tx = create_state(cfg, obj, batch, steps_per_epoch=100)
    batch = jax.tree.map(jnp.asarray, batch)

    def loss_only(params):
        (loss, metrics, _), _ = obj.apply(
            {'params': params, 'batch_stats': state.batch_stats},
            batch, train=True, mutable=['batch_stats'])
        return loss

    ptime('objective fwd', lambda p: loss_only(p), state.params)
    ptime('objective grad', lambda p: jax.grad(loss_only)(p), state.params)

    grads = jax.jit(jax.grad(loss_only))(state.params)
    grads = jax.tree.map(lambda x: x, grads)
    ptime('tx.update', lambda g: tx.update(g, state.opt_state, state.params)[0],
          grads)

    def full_step(params, opt_state):
        g = jax.grad(loss_only)(params)
        updates, no = tx.update(g, opt_state, params)
        import optax
        return optax.apply_updates(params, updates)

    ptime('grad + update', full_step, state.params, state.opt_state)


if __name__ == '__main__':
    main()
