"""ctypes loader for the native C++ LAPJV solver.

Builds native/liblapjv.so on demand with g++ (no pybind11 dependency) and
exposes ``lapjv_cost_limit`` with lap.lapjv extend_cost/cost_limit
semantics — the exact solver the reference calls 3x per frame
(demo_bottrack_onnx_tflite.py:1682-1693). Used for host-mode parity runs
and as an oracle for the on-device auction solver.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblapjv.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                   capture_output=True)


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "lapjv.cpp")
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.lapjv_cost_limit.restype = ctypes.c_double
    lib.lapjv_cost_limit.argtypes = [
        ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_double,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return lib


def lapjv_cost_limit(
    cost: np.ndarray, cost_limit: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact thresholded LAP. cost: [n, m] -> (col_for_row [n],
    row_for_col [m]), -1 for unmatched."""
    lib = load()
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    col_for_row = np.empty(n, dtype=np.int32)
    row_for_col = np.empty(m, dtype=np.int32)
    if n and m:
        lib.lapjv_cost_limit(n, m, cost, float(cost_limit), col_for_row,
                             row_for_col)
    else:
        col_for_row[:] = -1
        row_for_col[:] = -1
    return col_for_row, row_for_col
