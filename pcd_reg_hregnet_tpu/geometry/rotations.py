"""Euler / quaternion / matrix conversions, branchless and jit-safe.

Re-designs `/root/reference/transform/transform.py:7-266` (euler<->matrix,
Shepperd quaternion extraction `:62`, `mat2xyzrpy:158`,
`quaternion_distance:237`, `compute_angular_error:252`) and the pytorch3d
`matrix_to_euler_angles(convention="XYZ")` used by the losses/metrics
(`/root/reference/losses/losses.py:143`).

Convention: `matrix_to_euler_xyz` inverts R = Rx(ax) @ Ry(ay) @ Rz(az),
matching pytorch3d's "XYZ" convention used throughout the reference.
"""
from __future__ import annotations

import jax.numpy as jnp


def euler_xyz_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] (ax, ay, az) -> [..., 3, 3] with R = Rx @ Ry @ Rz."""
    ax, ay, az = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    row0 = jnp.stack([cy * cz, -cy * sz, sy], axis=-1)
    row1 = jnp.stack([cx * sz + sx * sy * cz, cx * cz - sx * sy * sz, -sx * cy], axis=-1)
    row2 = jnp.stack([sx * sz - cx * sy * cz, sx * cz + cx * sy * sz, cx * cy], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_euler_xyz(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3] inverting R = Rx @ Ry @ Rz (pytorch3d "XYZ")."""
    ay = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    ax = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    az = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return jnp.stack([ax, ay, az], axis=-1)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w, x, y, z).

    Branchless Shepperd method (the reference's branching version is at
    transform/transform.py:62-156): compute all four candidate quaternions
    and select by the largest diagonal-based discriminant with `jnp.where`.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Case w: trace largest
    qw_w = safe_sqrt(1.0 + trace) / 2.0
    q_w = jnp.stack([qw_w, (m21 - m12) / (4 * qw_w), (m02 - m20) / (4 * qw_w),
                     (m10 - m01) / (4 * qw_w)], axis=-1)
    # Case x
    qx_x = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q_x = jnp.stack([(m21 - m12) / (4 * qx_x), qx_x, (m01 + m10) / (4 * qx_x),
                     (m02 + m20) / (4 * qx_x)], axis=-1)
    # Case y
    qy_y = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q_y = jnp.stack([(m02 - m20) / (4 * qy_y), (m01 + m10) / (4 * qy_y), qy_y,
                     (m12 + m21) / (4 * qy_y)], axis=-1)
    # Case z
    qz_z = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q_z = jnp.stack([(m10 - m01) / (4 * qz_z), (m02 + m20) / (4 * qz_z),
                     (m12 + m21) / (4 * qz_z), qz_z], axis=-1)

    cond_w = (trace > 0.0)[..., None]
    cond_x = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond_y = (m11 >= m22)[..., None]
    q = jnp.where(cond_w, q_w, jnp.where(cond_x, q_x, jnp.where(cond_y, q_y, q_z)))
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_distance(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Angular distance (radians) between unit quaternions [..., 4]."""
    dot = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(dot, -1.0, 1.0))


def mat2xyzrpy(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] -> [..., 6] (x, y, z, roll, pitch, yaw).

    Matches the rpy extraction in reference transform/transform.py:158-199.
    """
    roll = jnp.arctan2(-T[..., 1, 2], T[..., 2, 2])
    pitch = jnp.arcsin(jnp.clip(T[..., 0, 2], -1.0, 1.0))
    yaw = jnp.arctan2(-T[..., 0, 1], T[..., 0, 0])
    return jnp.stack([T[..., 0, 3], T[..., 1, 3], T[..., 2, 3], roll, pitch, yaw], axis=-1)
