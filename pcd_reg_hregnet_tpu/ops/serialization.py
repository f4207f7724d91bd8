"""Space-filling-curve serialization of point clouds (z-order / Hilbert).

TPU-native equivalent of `/root/reference/models/model_v6/serialization/`
(z-order LUT encode `z_order.py:12-126`, Hilbert `hilbert.py:91`, dispatch
`default.py:8-38`).  Re-designed for this framework's fixed-shape batches:

* the reference packs a batch index into the high bits of an int64 code so
  one flat sort keeps batches contiguous; here every cloud is a row of a
  dense [B, N] batch, so we sort each row independently (vmapped) and never
  need 64-bit codes or batch prefixes;
* 3 x 20-bit z-order codes are split into two uint32 keys (high/low bit
  planes) and ordered lexicographically — avoids int64 entirely (JAX
  defaults to 32-bit) while covering a 10.5 km extent at 1 cm resolution.

`encode` returns sort keys; `serialize` returns (order, inverse) index
arrays like the reference's `Point.serialization()` (`ptv3.py:81-136`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _part1by2_10(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so there are 2 zero bits between each.

    Magic-number bit spreading (same math as the reference's LUT encode,
    expressed as shifts/masks the VPU executes directly).
    """
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & jnp.uint32(0x30000FF)
    x = (x | (x << 8)) & jnp.uint32(0x300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x30C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x9249249)
    return x


def z_order_keys(grid_coord: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Morton keys for integer grid coords [..., 3] (20 usable bits/axis).

    Returns (hi, lo) uint32 keys; order lexicographically by (hi, lo).
    Bit layout matches z-order with x in the least-significant interleave
    slot (reference z_order.py xyz2key: key = (x << 2) | (y << 1) | z per
    bit-plane with z as... we use [z, y, x] significance: x least).
    """
    x = grid_coord[..., 0].astype(jnp.uint32)
    y = grid_coord[..., 1].astype(jnp.uint32)
    z = grid_coord[..., 2].astype(jnp.uint32)
    lo = _part1by2_10(x) | (_part1by2_10(y) << 1) | (_part1by2_10(z) << 2)
    hi = _part1by2_10(x >> 10) | (_part1by2_10(y >> 10) << 1) | (_part1by2_10(z >> 10) << 2)
    return hi, lo


def _unpart1by2_10(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `_part1by2_10`: compact every 3rd bit into the low 10."""
    x = x.astype(jnp.uint32) & jnp.uint32(0x9249249)
    x = (x | (x >> 2)) & jnp.uint32(0x30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x300F00F)
    x = (x | (x >> 8)) & jnp.uint32(0x30000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x3FF)
    return x


def z_order_decode(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Invert `z_order_keys`: (hi, lo) uint32 -> grid coords [..., 3] int32.

    Counterpart of the reference's `key2xyz` decode (`z_order.py:63-126`).
    """
    x = _unpart1by2_10(lo) | (_unpart1by2_10(hi) << 10)
    y = _unpart1by2_10(lo >> 1) | (_unpart1by2_10(hi >> 1) << 10)
    z = _unpart1by2_10(lo >> 2) | (_unpart1by2_10(hi >> 2) << 10)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def grid_coords(xyz: jnp.ndarray, grid_size: float) -> jnp.ndarray:
    """Voxelize to non-negative integer grid coords per cloud [B, N, 3].

    Matches `Point.serialization()`'s floor((coord - min)/grid) per batch
    element (reference ptv3.py:99-110 uses a global min; per-cloud min is
    equivalent for ordering and keeps codes small).
    """
    mins = jnp.min(xyz, axis=1, keepdims=True)
    return jnp.floor((xyz - mins) / grid_size).astype(jnp.int32)


@partial(jax.jit, static_argnames=('order',))
def serialize(xyz: jnp.ndarray, grid_size: float = 0.01, order: str = 'z'):
    """Compute serialization permutation per cloud.

    Args:
        xyz: [B, N, 3] float coordinates.
        grid_size: voxel size for code computation.
        order: 'z' or 'z-trans' (axes transposed before encoding).
    Returns:
        (order_idx [B, N] int32, inverse_idx [B, N] int32) with
        ``sorted = x[order_idx]`` and ``x = sorted[inverse_idx]``.
    """
    if order in ('hilbert', 'hilbert-trans'):
        from .hilbert import serialize_hilbert
        return serialize_hilbert(xyz, grid_size, order)
    g = grid_coords(xyz, grid_size)
    if order == 'z-trans':
        g = g[..., ::-1]
    elif order != 'z':
        raise ValueError(f'unsupported serialization order: {order}')
    hi, lo = z_order_keys(g)

    def sort_one(hi_row, lo_row):
        # lexicographic: primary hi, secondary lo
        perm = jnp.lexsort((lo_row, hi_row)).astype(jnp.int32)
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=jnp.int32))
        return perm, inv

    return jax.vmap(sort_one)(hi, lo)
