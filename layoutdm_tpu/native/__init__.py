"""ctypes bindings for the native eval engine (compile-on-first-use).

`lsap.cpp` provides the Hungarian solver and the maximum-IoU score-matrix
kernel.  The library builds lazily with g++ into a per-repo cache; on any
failure the callers (eval.metrics) silently fall back to scipy, so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "lsap.cpp")
_LIB_PATH = os.path.join(_HERE, "liblsap.so")
_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(
        _LIB_PATH
    ) >= os.path.getmtime(_SRC):
        return ctypes.CDLL(_LIB_PATH)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        # retry without openmp (minimal toolchains)
        try:
            subprocess.run(
                [c for c in cmd if c != "-fopenmp"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    return ctypes.CDLL(_LIB_PATH)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        try:
            _lib = _build()
            if _lib is not None:
                _lib.solve_lsap.restype = ctypes.c_double
        except Exception:
            _lib = None
    return _lib


def linear_sum_assignment(
    cost: np.ndarray, maximize: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Drop-in for scipy.optimize.linear_sum_assignment (native if built)."""
    lib = get_lib()
    if lib is None:
        from scipy.optimize import linear_sum_assignment as _scipy

        return _scipy(cost, maximize=maximize)
    c = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = c.shape
    col4row = np.full((n,), -1, dtype=np.int32)
    lib.solve_lsap(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(n),
        ctypes.c_int(m),
        col4row.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(1 if maximize else 0),
    )
    rows = np.nonzero(col4row >= 0)[0]
    return rows, col4row[rows]


def docsim_pairs(
    layouts_1, layouts_2, max_diff_thresh: int = 3
) -> Optional[np.ndarray]:
    """Per-pair DocSim scores (aligned lists); None without the library."""
    lib = get_lib()
    if lib is None:
        return None

    def pack(group):
        boxes = np.concatenate(
            [np.asarray(b, np.float32).reshape(-1, 4) for b, _ in group]
            or [np.zeros((0, 4), np.float32)]
        )
        labels = np.concatenate(
            [np.asarray(l, np.int32).reshape(-1) for _, l in group]
            or [np.zeros((0,), np.int32)]
        )
        offsets = np.zeros((len(group) + 1,), np.int32)
        np.cumsum([len(l) for _, l in group], out=offsets[1:])
        return (
            np.ascontiguousarray(boxes),
            np.ascontiguousarray(labels),
            np.ascontiguousarray(offsets),
        )

    b1, l1, o1 = pack(layouts_1)
    b2, l2, o2 = pack(layouts_2)
    n = min(len(layouts_1), len(layouts_2))
    out = np.zeros((n,), np.float64)
    lib.docsim_pairs(
        b1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        l1.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        o1.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        b2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        l2.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        o2.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(n),
        ctypes.c_int(max_diff_thresh),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def max_iou_score_matrix(group1, group2) -> Optional[np.ndarray]:
    """(N, M) pair scores for two layout groups (lists of (bbox, label)).
    Returns None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None

    def pack(group):
        boxes = np.concatenate(
            [np.asarray(b, np.float32).reshape(-1, 4) for b, _ in group]
        )
        labels = np.concatenate(
            [np.asarray(l, np.int32).reshape(-1) for _, l in group]
        )
        offsets = np.zeros((len(group) + 1,), np.int32)
        np.cumsum([len(l) for _, l in group], out=offsets[1:])
        return (
            np.ascontiguousarray(boxes),
            np.ascontiguousarray(labels),
            np.ascontiguousarray(offsets),
        )

    b1, l1, o1 = pack(group1)
    b2, l2, o2 = pack(group2)
    N, M = len(group1), len(group2)
    out = np.zeros((N, M), np.float64)
    lib.max_iou_score_matrix(
        b1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        l1.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        o1.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(N),
        b2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        l2.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        o2.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(M),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
