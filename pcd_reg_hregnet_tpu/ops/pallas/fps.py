"""Pallas TPU kernel for farthest-point sampling (FPS / weighted FPS).

The XLA reference implementation (`ops/sampling.py`) is a `fori_loop` whose
per-step state (the running min-distance array) may bounce through HBM;
this kernel pins the whole loop state in VMEM and — crucially — processes
the **entire batch per VPU op**: TPU grid steps execute sequentially on a
core, so a per-batch grid would multiply the sequential iteration count by
B.  Instead one program holds [Bt, N] planes and every iteration updates
all batch rows at once (row-wise argmax + one-hot gather are lane/sublane
parallel).  This is the same dataflow as the reference CUDA kernel
(`furthest_point_sampling_gpu.cu:84-419` — per-batch thread blocks,
shared-memory reduction) mapped onto the TPU memory hierarchy.

Semantics are identical to `ops/sampling.py`: first index 0, running min
distance, weighted variant scales candidate distances by their own weight.

Index output goes to a VMEM [Bt, nsample] buffer via dynamic column
stores (scalar stores are illegal in VMEM; vector stores are fine).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INIT = 1e10
_NEG = -1e30

# batch rows held per program; 8 matches the VPU sublane count
_BT = 8


def _fps_kernel(xyz_ref, w_ref, idx_ref, temp_ref, *, nsample, n, weighted):
    """xyz_ref: [3, Bt, Np]; w_ref: [Bt, Np]; idx_ref: [Bt, nsample] i32 out
    (VMEM, nsample a multiple of 128); temp_ref: [Bt, Np] f32 scratch.

    Dynamic VMEM stores must be 128-aligned in the lane dimension, so
    selections accumulate in a [Bt, 128] register tile (`pending`) written
    into via a lane-select each step and flushed with an aligned store
    every 128 iterations.
    """
    bt, np_ = w_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, np_), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (bt, 128), 1)
    valid = lane < n
    temp_ref[...] = jnp.where(valid, _INIT, _NEG)

    xs = xyz_ref[0]
    ys = xyz_ref[1]
    zs = xyz_ref[2]

    def body(j, carry):
        last, pending = carry                                # [Bt,1], [Bt,128]
        onehot = (lane == last).astype(jnp.float32)          # [Bt, Np]
        x1 = jnp.sum(xs * onehot, axis=1, keepdims=True)     # [Bt, 1]
        y1 = jnp.sum(ys * onehot, axis=1, keepdims=True)
        z1 = jnp.sum(zs * onehot, axis=1, keepdims=True)
        dx = xs - x1
        dy = ys - y1
        dz = zs - z1
        d = dx * dx + dy * dy + dz * dz
        if weighted:
            d = d * w_ref[...]
        temp = jnp.minimum(temp_ref[...], jnp.where(valid, d, _NEG))
        temp_ref[...] = temp
        # argmax as max + first-matching-lane (min index): Mosaic fails to
        # legalize jnp.argmax's f32->i32 vector cast at Np=128 (one lane
        # tile); this formulation uses only compares and an integer min,
        # and keeps argmax's first-max tie-breaking.
        m = jnp.max(temp, axis=1, keepdims=True)                 # [Bt, 1]
        nxt = jnp.min(jnp.where(temp >= m, lane, jnp.int32(2 ** 30)),
                      axis=1, keepdims=True)                     # [Bt, 1]

        col = jax.lax.rem(j, 128)
        pending = jnp.where(lane128 == col, nxt, pending)

        @pl.when(col == 127)
        def _():
            base = pl.multiple_of(j - 127, 128)
            idx_ref[:, pl.ds(base, 128)] = pending

        return nxt, pending

    # j = 0 is the fixed initial selection (index 0): the zero-initialised
    # pending tile already holds it in column 0, so the loop starts at 1
    init = (jnp.zeros((bt, 1), jnp.int32), jnp.zeros((bt, 128), jnp.int32))
    jax.lax.fori_loop(1, nsample, body, init)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=('nsample',))
def fps_pallas(xyz: jnp.ndarray, nsample: int) -> jnp.ndarray:
    """Pallas FPS: [B, N, 3] -> [B, nsample] int32."""
    return _fps_impl(xyz, None, nsample)


@partial(jax.jit, static_argnames=('nsample',))
def weighted_fps_pallas(xyz: jnp.ndarray, weights: jnp.ndarray,
                        nsample: int) -> jnp.ndarray:
    return _fps_impl(xyz, weights, nsample)


def _fps_impl(xyz, weights, nsample):
    B, N, _ = xyz.shape
    Np = _round_up(N, 128)
    Bp = _round_up(B, _BT)
    nsp = _round_up(nsample, 128)
    x = jnp.moveaxis(xyz.astype(jnp.float32), -1, 0)         # [3, B, N]
    x = jnp.pad(x, ((0, 0), (0, Bp - B), (0, Np - N)))
    if weights is None:
        w = jnp.ones((Bp, Np), jnp.float32)
        weighted = False
    else:
        w = jnp.pad(weights.astype(jnp.float32), ((0, Bp - B), (0, Np - N)))
        weighted = True

    kernel = partial(_fps_kernel, nsample=nsp, n=N, weighted=weighted)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // _BT,),
        in_specs=[
            pl.BlockSpec((3, _BT, Np), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, Np), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BT, nsp), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, nsp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_BT, Np), jnp.float32)],
    )(x, w)
    return out[:B, :nsample]
