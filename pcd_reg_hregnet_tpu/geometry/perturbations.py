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


def _sample_invgauss(key: jax.Array, mu: float, scale: float,
                     shape=()) -> jnp.ndarray:
    """Inverse-Gaussian (Wald) samples via the Michael-Schucany-Haas
    transformation, matching scipy's ``invgauss.rvs(mu, scale)``
    parametrisation (X = scale * Wald(mu, lambda=1)) used by the reference
    (`transform/dataset_transforms.py:97-106`)."""
    k_n, k_u = jax.random.split(key)
    y = jax.random.normal(k_n, shape) ** 2
    # Wald(mu, lambda=1):
    x = mu + 0.5 * mu * mu * y - 0.5 * mu * jnp.sqrt(
        4.0 * mu * y + mu * mu * y * y)
    u = jax.random.uniform(k_u, shape)
    w = jnp.where(u <= mu / (mu + x), x, mu * mu / jnp.maximum(x, 1e-30))
    return scale * w


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
    elif distribution == 'inverse_gaussian':
        # reference constants (`transform/dataset_transforms.py:97-101`):
        # mu_w=1.0, lambda_w=0.1; mu_t=0.01, lambda_t=0.002.  The samples
        # are normalised to unit length then scaled — the IG draw fixes the
        # (all-positive-octant) *direction* distribution.
        w = _sample_invgauss(k_w, 1.0, 0.1, (3,))
        w = w / (jnp.linalg.norm(w) + 1e-12) * amp
        t = _sample_invgauss(k_t, 0.01, 0.002, (3,))
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
