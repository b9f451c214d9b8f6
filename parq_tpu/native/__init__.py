"""ctypes loader for the native eval kernels (lazy compile on first use).

Provides `lap_solve`, `iou3d_pair`, `iou3d_matrix`, `nms3d` backed by
native.cpp; every entry point has a pure-numpy fallback so missing toolchains
degrade gracefully. The library is built once into this directory.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libparqnative.so")
_SRC_PATH = os.path.join(_DIR, "native.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC_PATH,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:  # pragma: no cover
        print(f"parq_tpu.native: build failed ({e}); using numpy fallbacks",
              file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:  # pragma: no cover
        return None
    lib.lap_solve.restype = ctypes.c_int
    lib.lap_solve.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.iou3d_pair.restype = ctypes.c_double
    lib.iou3d_pair.argtypes = [ctypes.POINTER(ctypes.c_double)] * 2
    lib.iou3d_matrix.restype = None
    lib.iou3d_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    lib.nms3d.restype = None
    lib.nms3d.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
    _lib = lib
    return _lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def lap_solve(cost: np.ndarray) -> np.ndarray:
    """(nr, nc) cost, nr <= nc → (nr,) column assignment per row."""
    lib = get_lib()
    cost = np.ascontiguousarray(cost, np.float64)
    nr, nc = cost.shape
    if lib is not None:
        out = np.empty(nr, np.int32)
        rc = lib.lap_solve(_dp(cost), nr, nc,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if rc == 0:
            return out
    from scipy.optimize import linear_sum_assignment
    r, c = linear_sum_assignment(cost)
    out = np.empty(nr, np.int32)
    out[r] = c
    return out


def iou3d_pair(c1: np.ndarray, c2: np.ndarray) -> float:
    lib = get_lib()
    if lib is not None:
        c1 = np.ascontiguousarray(c1, np.float64)
        c2 = np.ascontiguousarray(c2, np.float64)
        return float(lib.iou3d_pair(_dp(c1), _dp(c2)))
    from ..evals.iou3d import iou3d
    return iou3d(c1, c2)[0]


def iou3d_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(na, 8, 3) x (nb, 8, 3) ODAM-convention corners → (na, nb) IoU."""
    lib = get_lib()
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    na, nb = a.shape[0], b.shape[0]
    if lib is not None and na and nb:
        out = np.empty((na, nb), np.float64)
        lib.iou3d_matrix(_dp(a), na, _dp(b), nb, _dp(out))
        return out
    from ..evals.iou3d import iou3d
    out = np.zeros((na, nb))
    for i in range(na):
        for j in range(nb):
            out[i, j] = iou3d(a[i], b[j])[0]
    return out


def nms3d(rows: np.ndarray, thresh: float, same_class: bool) -> np.ndarray:
    """(n, 8) AABB rows → (n,) bool keep."""
    lib = get_lib()
    rows = np.ascontiguousarray(rows, np.float64)
    n = rows.shape[0]
    if lib is not None:
        keep = np.zeros(n, np.uint8)
        lib.nms3d(_dp(rows), n, float(thresh), int(same_class),
                  keep.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        return keep.astype(bool)
    from ..evals.nms import _greedy
    keep = np.zeros(n, bool)
    keep[_greedy(rows, thresh, same_class)] = True
    return keep
