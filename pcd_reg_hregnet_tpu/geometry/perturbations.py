"""Random SE(3) decalibration sampling with explicit PRNG keys.

Re-designs `/root/reference/transform/dataset_transforms.py:8-176`
(`RandomTransformSE3`, `UniformTransformSE3` with uniform / gaussian /
inverse-gaussian magnitude distributions).  The decalibration protocol it
must reproduce exactly (`dataset/config.json:20-25`): uniform distribution,
`mag_randomly=True`, max 20 deg / 0.5 m; the perturbation `igt` is applied
to the source cloud and the training target is `gt = inverse(igt)`
(`train/train_reg_v11.py:333`).

All samplers are pure functions of a PRNG key and vmap over a batch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import se3, so3


def sample_twist(
    key: jax.Array,
    max_deg: float,
    max_tran: float,
    distribution: str = 'uniform',
    mag_randomly: bool = True,
) -> jnp.ndarray:
    """Sample one twist vector [6] = [w, v] describing a decalibration.

    Mirrors UniformTransformSE3.generate_transform: the rotation/translation
    magnitudes are themselves uniform in [0, max] when `mag_randomly`.
    """
    k_deg, k_tran, k_w, k_t = jax.random.split(key, 4)
    if mag_randomly:
        deg = jax.random.uniform(k_deg) * max_deg
        tran = jax.random.uniform(k_tran) * max_tran
    else:
        deg = jnp.asarray(max_deg, jnp.float32)
        tran = jnp.asarray(max_tran, jnp.float32)
    amp = deg * jnp.pi / 180.0

    if distribution == 'uniform':
        w = (2.0 * jax.random.uniform(k_w, (3,)) - 1.0) * amp
        t = (2.0 * jax.random.uniform(k_t, (3,)) - 1.0) * tran
    elif distribution == 'gaussian':
        w = jax.random.normal(k_w, (3,))
        w = w / (jnp.linalg.norm(w) + 1e-12) * amp
        t = jax.random.normal(k_t, (3,))
        t = t / (jnp.linalg.norm(t) + 1e-12) * tran
    else:
        raise ValueError(f'unsupported distribution: {distribution}')

    # Reference round-trips through exp/log of the packed (R, t) matrix: the
    # twist's translational part is V(w)^{-1} t, not t itself.
    G = se3.pack(so3.exp(w), t)
    return se3.log(G)


@partial(jax.jit, static_argnames=('max_deg', 'max_tran', 'distribution', 'mag_randomly', 'batch'))
def sample_igt(
    key: jax.Array,
    max_deg: float = 20.0,
    max_tran: float = 0.5,
    distribution: str = 'uniform',
    mag_randomly: bool = True,
    batch: int = 1,
) -> jnp.ndarray:
    """Sample a batch of decalibration matrices igt [B, 4, 4].

    Apply with `se3.transform(igt, points)`; the registration ground truth
    is `se3.inverse(igt)`.
    """
    keys = jax.random.split(key, batch)
    twists = jax.vmap(
        lambda k: sample_twist(k, max_deg, max_tran, distribution, mag_randomly)
    )(keys)
    return se3.exp(twists)
