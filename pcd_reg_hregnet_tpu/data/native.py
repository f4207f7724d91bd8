"""ctypes bindings for the native host-side point-cloud library (cc/).

The native library fuses .pcd.bin decode + range filter + fixed-N resample
(the per-item hot path of the input pipeline) in one pass; Python falls
back to the numpy pipeline when `cc/libpcd_native.so` hasn't been built
(`make -C cc`).  This mirrors the reference's split where the hot layer
under the Python framework is native (`models/PointUtils/` CUDA) — here
the device side is XLA/Pallas, so native buys back host time instead.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), '..', '..', 'cc',
                         'libpcd_native.so')
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.pc_filter_resample.restype = ctypes.c_int64
    lib.pc_filter_resample.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_float,
        ctypes.c_int64, ctypes.c_uint64, f32p, f32p]
    lib.pc_load_bin.restype = ctypes.c_int64
    lib.pc_load_bin.argtypes = [
        ctypes.c_char_p, ctypes.c_float, ctypes.c_int64, ctypes.c_uint64,
        f32p, f32p]
    lib.pc_transform.restype = None
    lib.pc_transform.argtypes = [f32p, ctypes.c_int64, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def filter_resample(points: np.ndarray, max_range: float, n_out: int,
                    seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Fused range filter + resample.  points: [N, >=3] float32 (xyz first,
    intensity in column 3 if present).  Returns (xyz [n_out, 3], inten [n_out])."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    out_xyz = np.empty((n_out, 3), np.float32)
    out_int = np.empty((n_out,), np.float32)
    if lib is None:
        raise RuntimeError('native library not built; run `make -C cc`')
    lib.pc_filter_resample(_f32p(points), points.shape[0], points.shape[1],
                           max_range, n_out, seed, _f32p(out_xyz), _f32p(out_int))
    return out_xyz, out_int


def load_bin(path: str, max_range: float, n_out: int,
             seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """One-pass .pcd.bin decode + filter + resample."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native library not built; run `make -C cc`')
    out_xyz = np.empty((n_out, 3), np.float32)
    out_int = np.empty((n_out,), np.float32)
    ret = lib.pc_load_bin(path.encode(), max_range, n_out, seed,
                          _f32p(out_xyz), _f32p(out_int))
    if ret == -1:
        raise IOError(f'cannot read {path}')
    if ret == -2:
        raise ValueError(f'unrecognised point record width in {path}')
    return out_xyz, out_int


def transform_inplace(points: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Apply a rigid [4, 4] transform in place to [N, 3] float32 points."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native library not built; run `make -C cc`')
    assert points.dtype == np.float32 and points.flags['C_CONTIGUOUS']
    T = np.ascontiguousarray(T, np.float32)
    lib.pc_transform(_f32p(points), points.shape[0], _f32p(T))
    return points
