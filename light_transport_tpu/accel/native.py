"""ctypes bridge to the C++ BVH builder (native/bvh_builder.cpp).

Builds ``liblt_native.so`` on first use if the toolchain is present; callers
(accel/bvh.py::build) fall back to the numpy builder when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblt_native.so")

_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-s", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lt_build_bvh.restype = ctypes.c_int64
        lib.lt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # lo
            ctypes.POINTER(ctypes.c_double),  # hi
            ctypes.POINTER(ctypes.c_double),  # centroid
            ctypes.c_int64,  # t
            ctypes.c_int32,  # max_leaf
            ctypes.POINTER(ctypes.c_double),  # out_min
            ctypes.POINTER(ctypes.c_double),  # out_max
            ctypes.POINTER(ctypes.c_int32),  # out_right
            ctypes.POINTER(ctypes.c_int32),  # out_first
            ctypes.POINTER(ctypes.c_int32),  # out_count
            ctypes.POINTER(ctypes.c_int32),  # out_axis
            ctypes.POINTER(ctypes.c_int64),  # order
        ]
        _lib = lib
        return lib
    except Exception:
        _lib_failed = True
        return None


def available() -> bool:
    return _load() is not None


def build_native(verts: np.ndarray, centroid: np.ndarray, max_leaf: int):
    """Same contract as accel.bvh._build_host; returns None-equivalent by
    raising if the native library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native builder unavailable")
    t = verts.shape[0]
    lo = np.ascontiguousarray(verts.min(axis=1), np.float64)
    hi = np.ascontiguousarray(verts.max(axis=1), np.float64)
    centroid = np.ascontiguousarray(centroid, np.float64)
    cap = 2 * t
    out_min = np.empty((cap, 3), np.float64)
    out_max = np.empty((cap, 3), np.float64)
    out_right = np.empty((cap,), np.int32)
    out_first = np.empty((cap,), np.int32)
    out_count = np.empty((cap,), np.int32)
    out_axis = np.empty((cap,), np.int32)
    order = np.arange(t, dtype=np.int64)

    def p(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    m = lib.lt_build_bvh(
        p(lo, ctypes.c_double), p(hi, ctypes.c_double),
        p(centroid, ctypes.c_double), t, max_leaf,
        p(out_min, ctypes.c_double), p(out_max, ctypes.c_double),
        p(out_right, ctypes.c_int32), p(out_first, ctypes.c_int32),
        p(out_count, ctypes.c_int32), p(out_axis, ctypes.c_int32),
        p(order, ctypes.c_int64),
    )
    if m <= 0:
        raise RuntimeError(f"native builder failed: {m}")
    return (
        out_min[:m], out_max[:m], out_right[:m], out_first[:m],
        out_count[:m], out_axis[:m], order,
    )
