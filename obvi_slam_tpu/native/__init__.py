"""ctypes bindings for the native host-runtime components (C++17).

Build with ``make -C obvi_slam_tpu/native``; everything degrades gracefully to
the numpy implementations when the shared library is absent or when
``OBVI_NATIVE=0`` is set.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).parent / "libobvi_native.so"
_lib = None


class _PairPlan(ctypes.Structure):
    _fields_ = [
        ("n_factors", ctypes.c_int64),
        ("n_pairs", ctypes.c_int64),
        ("n_cross", ctypes.c_int64),
        ("n_dest", ctypes.c_int64),
        ("factor_pair", ctypes.POINTER(ctypes.c_int32)),
        ("pair_block", ctypes.POINTER(ctypes.c_int32)),
        ("pair_land", ctypes.POINTER(ctypes.c_int32)),
        ("cross_a", ctypes.POINTER(ctypes.c_int32)),
        ("cross_b", ctypes.POINTER(ctypes.c_int32)),
        ("cross_dest", ctypes.POINTER(ctypes.c_int32)),
        ("dest_a", ctypes.POINTER(ctypes.c_int32)),
        ("dest_b", ctypes.POINTER(ctypes.c_int32)),
    ]


class _OrbObservations(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("feature_id", ctypes.POINTER(ctypes.c_int64)),
        ("frame_id", ctypes.POINTER(ctypes.c_int64)),
        ("camera_id", ctypes.POINTER(ctypes.c_int64)),
        ("px", ctypes.POINTER(ctypes.c_double)),
        ("py", ctypes.POINTER(ctypes.c_double)),
    ]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("OBVI_NATIVE", "1") == "0":
        return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.build_pair_plan.restype = ctypes.c_int
    lib.build_pair_plan.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(_PairPlan),
    ]
    lib.free_pair_plan.argtypes = [ctypes.POINTER(_PairPlan)]
    lib.load_orb_observations.restype = ctypes.c_int
    lib.load_orb_observations.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(_OrbObservations),
    ]
    lib.free_orb_observations.argtypes = [ctypes.POINTER(_OrbObservations)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_np(ptr, n, dtype):
    if n == 0:
        return np.zeros(0, dtype=dtype)
    return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)


def build_pair_plan_native(block_idx, land_idx, mask):
    """Native _build_pairs core. Returns (factor_pair, pair_block, pair_land,
    cross_a, cross_b, cross_dest, dest_a, dest_b) as numpy arrays or None if
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    block_idx = np.ascontiguousarray(block_idx, dtype=np.int64)
    land_idx = np.ascontiguousarray(land_idx, dtype=np.int64)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    plan = _PairPlan()
    rc = lib.build_pair_plan(
        block_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        land_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(block_idx),
        ctypes.byref(plan),
    )
    if rc != 0:
        return None
    try:
        out = (
            _as_np(plan.factor_pair, plan.n_factors, np.int32),
            _as_np(plan.pair_block, plan.n_pairs, np.int32),
            _as_np(plan.pair_land, plan.n_pairs, np.int32),
            _as_np(plan.cross_a, plan.n_cross, np.int32),
            _as_np(plan.cross_b, plan.n_cross, np.int32),
            _as_np(plan.cross_dest, plan.n_cross, np.int32),
            _as_np(plan.dest_a, plan.n_dest, np.int32),
            _as_np(plan.dest_b, plan.n_dest, np.int32),
        )
    finally:
        lib.free_pair_plan(ctypes.byref(plan))
    return out


def load_orb_observations_native(paths):
    """Parse per-frame ORB observation files into flat arrays. Returns
    (feature_id, frame_id, camera_id, px, py) or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    joined = b"\0".join(str(p).encode() for p in paths) + b"\0"
    obs = _OrbObservations()
    rc = lib.load_orb_observations(joined, len(paths), ctypes.byref(obs))
    if rc != 0:
        return None
    try:
        out = (
            _as_np(obs.feature_id, obs.n, np.int64),
            _as_np(obs.frame_id, obs.n, np.int64),
            _as_np(obs.camera_id, obs.n, np.int64),
            _as_np(obs.px, obs.n, np.float64),
            _as_np(obs.py, obs.n, np.float64),
        )
    finally:
        lib.free_orb_observations(ctypes.byref(obs))
    return out
