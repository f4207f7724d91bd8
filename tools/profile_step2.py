"""Confirm: step_fn cost with vs without explicit shardings (1-device mesh)."""
import dataclasses
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax


def main():
    B = 8
    from pcd_reg_hregnet_tpu.train import experiment
    from pcd_reg_hregnet_tpu.train.loop import create_state
    from pcd_reg_hregnet_tpu.train.objective import RegistrationObjective
    from pcd_reg_hregnet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                   replicated, shard_batch)

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
    mesh = make_mesh(1)

    def step_fn(state, batch):
        def loss_fn(params):
            (loss, metrics, _), mutated = obj.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, train=True, mutable=['batch_stats'])
            return loss, (metrics, mutated.get('batch_stats', state.batch_stats))
        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    def time_step(tag, step, st, b, n=10):
        st2, m = step(st, b)
        float(m['loss'])
        t0 = time.perf_counter()
        for _ in range(n):
            st2, m = step(st2, b)
        float(m['loss'])
        print(f'{tag:<40}{(time.perf_counter() - t0) / n * 1000:8.2f} ms', flush=True)

    plain = jax.jit(step_fn)
    time_step('jit, no shardings, no donate', plain, state, batch)

    donate_only = jax.jit(step_fn, donate_argnums=(0,))
    state3, _ = create_state(cfg, obj, batch, steps_per_epoch=100)
    time_step('jit, donate only', donate_only, state3, batch)

    rep, bsh = replicated(mesh), batch_sharding(mesh)
    shard_only = jax.jit(step_fn, in_shardings=(rep, bsh), out_shardings=(rep, rep))
    sb = shard_batch(batch, mesh)
    state4, _ = create_state(cfg, obj, batch, steps_per_epoch=100)
    time_step('jit, shardings only', shard_only, state4, sb)

    sharded = jax.jit(step_fn, donate_argnums=(0,),
                      in_shardings=(rep, bsh), out_shardings=(rep, rep))
    state2, _ = create_state(cfg, obj, batch, steps_per_epoch=100)
    time_step('jit, shardings + donate (loop.py)', sharded, state2, sb)


if __name__ == '__main__':
    main()


