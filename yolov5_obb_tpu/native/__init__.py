"""Lazy-built native geometry extension (ctypes over a g++-compiled .so).

``get_lib()`` returns the loaded library or None when no toolchain is
available; callers (devkit/poly_iou.py, devkit/result_merge.py) fall back to
the pure-NumPy implementations.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "polyiou.cpp"
_SO = _HERE / "libpolyiou.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
             "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.iou_poly.restype = ctypes.c_double
        lib.iou_poly.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
        ]
        lib.poly_overlaps.restype = None
        lib.poly_overlaps.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
        ]
        lib.poly_nms.restype = ctypes.c_int64
        lib.poly_nms.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"), ctypes.c_int64,
            ctypes.c_double,
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
        ]
        _lib = lib
        return _lib


def iou_poly_native(p1, p2) -> float | None:
    lib = get_lib()
    if lib is None:
        return None
    return float(
        lib.iou_poly(
            np.ascontiguousarray(p1, np.float64).reshape(8),
            np.ascontiguousarray(p2, np.float64).reshape(8),
        )
    )


def poly_overlaps_native(polys1, polys2):
    lib = get_lib()
    if lib is None:
        return None
    p1 = np.ascontiguousarray(polys1, np.float64).reshape(-1, 8)
    p2 = np.ascontiguousarray(polys2, np.float64).reshape(-1, 8)
    out = np.empty((len(p1), len(p2)), np.float64)
    lib.poly_overlaps(p1, len(p1), p2, len(p2), out)
    return out


def poly_nms_native(polys, scores, thresh: float):
    """Returns keep indices in score order, or None if lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(polys, np.float64).reshape(-1, 8)
    s = np.ascontiguousarray(scores, np.float64)
    order = np.argsort(-s).astype(np.int64)
    keep = np.zeros(len(p), np.uint8)
    lib.poly_nms(p, s, order, len(p), float(thresh), keep)
    return [int(i) for i in order if keep[i]]
