"""ctypes bindings for the native runtime library (native/dge_native.cpp).

Builds the shared library on first use when a toolchain is present; every
entry point has a pure-Python fallback so the framework works without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "dge_native.cpp")
_LIB = os.path.join(_REPO, "native", "libdge_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-o", _LIB, _SRC,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.dge_knn_mean_sq_dist.restype = ctypes.c_int
        lib.dge_knn_mean_sq_dist.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.dge_colmap_points3d_count.restype = ctypes.c_int64
        lib.dge_colmap_points3d_count.argtypes = [ctypes.c_char_p]
        lib.dge_colmap_points3d_read.restype = ctypes.c_int
        lib.dge_colmap_points3d_read.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.dge_ply_read_block.restype = ctypes.c_int
        lib.dge_ply_read_block.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def knn_mean_sq_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance to the k nearest neighbors (distCUDA2 analog,
    simple_knn.cu:185-218). Native grid-hash when available, scipy KDTree
    otherwise."""
    pts = np.ascontiguousarray(points, dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(len(pts), np.float32)
        rc = lib.dge_knn_mean_sq_dist(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(pts),
            k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc == 0:
            return out
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    d, _ = tree.query(pts, k=k + 1)
    return np.mean(d[:, 1:] ** 2, axis=1).astype(np.float32)


def colmap_points3d(path: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native points3D.bin parse; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.dge_colmap_points3d_count(path.encode())
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    rc = lib.dge_colmap_points3d_read(
        path.encode(), n,
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return xyz, rgb.astype(np.float32) / 255.0
