"""Hilbert-curve encoding via the Skilling transform (bit-plane form).

Equivalent of `/root/reference/models/model_v6/serialization/hilbert.py:91`
(itself the public numpy-hilbert-curve Skilling algorithm): coordinates are
unpacked to boolean bit planes, the Skilling bit-swap/invert passes run as
a static double loop over (bit, dim) — pure vectorised XOR/AND ops on the
VPU — and the resulting Gray code is decoded and packed into two uint32
sort keys (hi, lo), avoiding 64-bit integers entirely (JAX default x32).

`serialize_hilbert` mirrors `ops/serialization.serialize` for order
'hilbert' / 'hilbert-trans'.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .serialization import grid_coords

NUM_DIMS = 3


def _to_bits(x: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """int [..., 3] -> bool bit planes [..., 3, num_bits], MSB first."""
    shifts = jnp.arange(num_bits - 1, -1, -1, dtype=jnp.uint32)
    return ((x[..., None].astype(jnp.uint32) >> shifts) & 1).astype(jnp.bool_)


def _gray_to_binary(gray: jnp.ndarray) -> jnp.ndarray:
    """Gray -> binary along the last axis (prefix-xor via log-shifts)."""
    n = gray.shape[-1]
    shift = 1
    while shift < n:
        shifted = jnp.concatenate(
            [jnp.zeros(gray.shape[:-1] + (shift,), jnp.bool_), gray[..., :-shift]],
            axis=-1)
        gray = jnp.logical_xor(gray, shifted)
        shift *= 2
    return gray


@partial(jax.jit, static_argnames=('num_bits',))
def hilbert_keys(grid_coord: jnp.ndarray, num_bits: int = 16):
    """Hilbert indices of integer grid coords [..., 3].

    Returns (hi, lo) uint32 keys: hi = top `3*num_bits - 24` bits,
    lo = bottom 24 bits (num_bits <= 16 keeps both in uint32 range).
    Order lexicographically by (hi, lo).
    """
    assert num_bits <= 16, 'two uint32 keys cover at most 16 bits per axis'
    gray = _to_bits(grid_coord, num_bits)          # [..., 3, num_bits]

    # Skilling transform (reference hilbert.py:155-177): static (bit, dim)
    # double loop of masked bit swaps — unrolls to pure vector XOR/ANDs.
    for bit in range(num_bits):
        for dim in range(NUM_DIMS):
            mask = gray[..., dim, bit:bit + 1]      # [..., 1]
            lower0 = gray[..., 0, bit + 1:]
            lowerd = gray[..., dim, bit + 1:]
            # invert dim-0 lower bits where this bit is set
            lower0 = jnp.logical_xor(lower0, mask)
            # where unset, exchange lower bits of dim with dim 0
            to_flip = jnp.logical_and(jnp.logical_not(mask),
                                      jnp.logical_xor(lower0, lowerd))
            lowerd = jnp.logical_xor(lowerd, to_flip)
            lower0 = jnp.logical_xor(lower0, to_flip)
            gray = gray.at[..., dim, bit + 1:].set(lowerd)
            gray = gray.at[..., 0, bit + 1:].set(lower0)

    # interleave: [..., num_bits, 3] -> [..., 3 * num_bits] (MSB first)
    flat = jnp.swapaxes(gray, -1, -2).reshape(grid_coord.shape[:-1] + (3 * num_bits,))
    bits = _gray_to_binary(flat).astype(jnp.uint32)

    total = 3 * num_bits
    nlo = min(total, 24)
    lo_bits = bits[..., total - nlo:]
    weights_lo = (jnp.uint32(1) << jnp.arange(nlo - 1, -1, -1, dtype=jnp.uint32))
    lo = jnp.sum(lo_bits * weights_lo, axis=-1, dtype=jnp.uint32)
    nhi = total - nlo
    if nhi == 0:
        return jnp.zeros_like(lo), lo
    hi_bits = bits[..., :nhi]
    weights_hi = (jnp.uint32(1) << jnp.arange(nhi - 1, -1, -1, dtype=jnp.uint32))
    hi = jnp.sum(hi_bits * weights_hi, axis=-1, dtype=jnp.uint32)
    return hi, lo


@partial(jax.jit, static_argnames=('num_bits',))
def hilbert_decode(hi: jnp.ndarray, lo: jnp.ndarray, num_bits: int = 16):
    """Invert `hilbert_keys`: (hi, lo) uint32 -> grid coords [..., 3] int32.

    Counterpart of the reference's `hilbert.decode` (`hilbert.py:201`):
    binary -> Gray, de-interleave to per-axis bit planes, then run the
    Skilling passes in reverse (each pass is an involutive masked swap
    followed by the mask inversion undone).
    """
    total = 3 * num_bits
    nlo = min(total, 24)
    nhi = total - nlo
    shifts_lo = jnp.arange(nlo - 1, -1, -1, dtype=jnp.uint32)
    lo_bits = ((lo[..., None] >> shifts_lo) & 1).astype(jnp.bool_)
    if nhi:
        shifts_hi = jnp.arange(nhi - 1, -1, -1, dtype=jnp.uint32)
        hi_bits = ((hi[..., None] >> shifts_hi) & 1).astype(jnp.bool_)
        bits = jnp.concatenate([hi_bits, lo_bits], axis=-1)   # [..., total]
    else:
        bits = lo_bits

    # binary -> Gray (MSB first): gray[i] = b[i] ^ b[i-1]
    shifted = jnp.concatenate(
        [jnp.zeros(bits.shape[:-1] + (1,), jnp.bool_), bits[..., :-1]], axis=-1)
    gray_flat = jnp.logical_xor(bits, shifted)
    # de-interleave [..., num_bits, 3] -> [..., 3, num_bits]
    gray = jnp.swapaxes(gray_flat.reshape(gray_flat.shape[:-1] + (num_bits, 3)),
                        -1, -2)

    for bit in range(num_bits - 1, -1, -1):
        for dim in range(NUM_DIMS - 1, -1, -1):
            mask = gray[..., dim, bit:bit + 1]
            lower0 = gray[..., 0, bit + 1:]
            lowerd = gray[..., dim, bit + 1:]
            to_flip = jnp.logical_and(jnp.logical_not(mask),
                                      jnp.logical_xor(lower0, lowerd))
            lowerd = jnp.logical_xor(lowerd, to_flip)
            lower0 = jnp.logical_xor(lower0, to_flip)
            lower0 = jnp.logical_xor(lower0, mask)
            gray = gray.at[..., dim, bit + 1:].set(lowerd)
            gray = gray.at[..., 0, bit + 1:].set(lower0)

    weights = (jnp.uint32(1) << jnp.arange(num_bits - 1, -1, -1,
                                           dtype=jnp.uint32))
    return jnp.sum(gray.astype(jnp.uint32) * weights, axis=-1,
                   dtype=jnp.uint32).astype(jnp.int32)


@partial(jax.jit, static_argnames=('order', 'num_bits'))
def serialize_hilbert(xyz: jnp.ndarray, grid_size: float = 0.01,
                      order: str = 'hilbert', num_bits: int = 16):
    """Hilbert serialization permutation per cloud (cf. `serialize`)."""
    g = grid_coords(xyz, grid_size)
    g = jnp.clip(g, 0, (1 << num_bits) - 1)
    if order == 'hilbert-trans':
        g = g[..., ::-1]
    elif order != 'hilbert':
        raise ValueError(f'unsupported hilbert order: {order}')
    hi, lo = hilbert_keys(g, num_bits)

    def sort_one(hi_row, lo_row):
        perm = jnp.lexsort((lo_row, hi_row)).astype(jnp.int32)
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=jnp.int32))
        return perm, inv

    return jax.vmap(sort_one)(hi, lo)
