"""SO(3) exponential / logarithm maps, branchless and jit-safe.

TPU-native re-design of the Taylor-stabilized Rodrigues math in the reference
(`/root/reference/transform/rodrigues.py:4-175` sinc helpers, `:307` SO3.exp,
`:336` SO3.log).  All small-angle branches are expressed with `jnp.where`
instead of boolean indexing so every function jits and vmaps cleanly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL = 1e-2  # switch to Taylor series below this |theta|


def _safe(t: jnp.ndarray) -> jnp.ndarray:
    """Replace near-zero values with 1 so divisions are finite everywhere.

    The result of the division is only consumed where |t| >= _SMALL, so the
    substituted value never leaks into the output (it does keep gradients
    finite, which naive masking does not).
    """
    return jnp.where(jnp.abs(t) < _SMALL, jnp.ones_like(t), t)


def safe_norm(w: jnp.ndarray) -> jnp.ndarray:
    """||w|| along the last axis with a finite gradient at w = 0.

    `jnp.linalg.norm` has a NaN gradient at exactly zero (0/0); adding a
    tiny epsilon inside the sqrt keeps the primal error < 1e-12 and the
    gradient zero at the origin.
    """
    return jnp.sqrt(jnp.sum(w * w, axis=-1) + 1e-24)


def sinc1(t: jnp.ndarray) -> jnp.ndarray:
    """sin(t)/t with Taylor fallback (reference rodrigues.py:9-20)."""
    t2 = t * t
    taylor = 1.0 - t2 / 6.0 * (1.0 - t2 / 20.0 * (1.0 - t2 / 42.0))
    exact = jnp.sin(_safe(t)) / _safe(t)
    return jnp.where(jnp.abs(t) < _SMALL, taylor, exact)


def sinc2(t: jnp.ndarray) -> jnp.ndarray:
    """(1 - cos(t))/t^2 with Taylor fallback (rodrigues.py:62-74)."""
    t2 = t * t
    taylor = 1.0 / 2.0 * (1.0 - t2 / 12.0 * (1.0 - t2 / 30.0 * (1.0 - t2 / 56.0)))
    exact = (1.0 - jnp.cos(_safe(t))) / (_safe(t) ** 2)
    return jnp.where(jnp.abs(t) < _SMALL, taylor, exact)


def sinc3(t: jnp.ndarray) -> jnp.ndarray:
    """(t - sin(t))/t^3 with Taylor fallback (rodrigues.py:114-126)."""
    t2 = t * t
    taylor = 1.0 / 6.0 * (1.0 - t2 / 20.0 * (1.0 - t2 / 42.0 * (1.0 - t2 / 72.0)))
    s = _safe(t)
    exact = (s - jnp.sin(s)) / (s ** 3)
    return jnp.where(jnp.abs(t) < _SMALL, taylor, exact)


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    row0 = jnp.stack([zeros, -wz, wy], axis=-1)
    row1 = jnp.stack([wz, zeros, -wx], axis=-1)
    row2 = jnp.stack([-wy, wx, zeros], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: [..., 3, 3] skew -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: axis-angle [..., 3] -> rotation matrix [..., 3, 3].

    R = I + sinc1(t) W + sinc2(t) W^2   (reference rodrigues.py:307-334).
    """
    t = safe_norm(w)
    W = hat(w)
    W2 = jnp.matmul(W, W, precision='highest')
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    s1 = sinc1(t)[..., None, None]
    s2 = sinc2(t)[..., None, None]
    return I + s1 * W + s2 * W2


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3].

    Branchless version of reference rodrigues.py:336-377: theta from the
    trace, vee of the skew part scaled by theta / (2 sin theta).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    skew = 0.5 * (R - jnp.swapaxes(R, -1, -2))
    # w = theta / (2 sin theta) * vee(R - R^T) == vee(skew) / sinc1(theta)
    return vee(skew) / sinc1(theta)[..., None]


def transform(R: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply rotation(s) to points: [..., 3, 3] x [..., N, 3] -> [..., N, 3]."""
    return jnp.einsum('...ij,...nj->...ni', R, points, precision='highest')


def inverse(R: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(R, -1, -2)


def geodesic_distance(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Angle of R1^T R2 in radians, per batch element."""
    M = jnp.matmul(jnp.swapaxes(R1, -1, -2), R2, precision='highest')
    trace = M[..., 0, 0] + M[..., 1, 1] + M[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos_t)


def random_rotation(key: jax.Array, batch_shape=()) -> jnp.ndarray:
    """Uniform random rotations via normalized axis-angle of random magnitude."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, batch_shape + (3,))
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    angle = jax.random.uniform(k2, batch_shape + (1,), minval=0.0, maxval=jnp.pi)
    return exp(axis * angle)
