"""ctypes bindings for the native host-side runtime (geoa3_native.cpp).

Everything degrades gracefully: if the shared library has not been built
(`python -m geoa3_tpu.native.build`), `available()` is False and callers fall
back to the pure-numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libgeoa3_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.geoa3_parse_points.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int
    ]
    lib.geoa3_parse_points.restype = ctypes.c_int
    lib.geoa3_fps.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
    lib.geoa3_fps.restype = None
    lib.geoa3_sample_mesh.argtypes = [
        f32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, f32p, f32p,
    ]
    lib.geoa3_sample_mesh.restype = None
    lib.geoa3_normalize.argtypes = [f32p, ctypes.c_int]
    lib.geoa3_normalize.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def parse_points(path: str, max_rows: int, cols: int = 6) -> np.ndarray:
    """Fast txt point-file reader -> [rows, cols] float32 (np.loadtxt drop-in)."""
    lib = _load()
    assert lib is not None, "native library not built"
    out = np.empty((max_rows, cols), np.float32)
    rows = lib.geoa3_parse_points(path.encode(), _fptr(out), max_rows, cols)
    if rows < 0:
        raise FileNotFoundError(path)
    return out[:rows]


def fps(points: np.ndarray, m: int, start: int = -1) -> np.ndarray:
    """Greedy FPS indices [m]. start=-1 -> CUDA semantics (start 0, mag skip)."""
    lib = _load()
    assert lib is not None, "native library not built"
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(m, np.int32)
    lib.geoa3_fps(_fptr(pts), pts.shape[0], m, start, _iptr(out))
    return out


def sample_mesh(
    vertices: np.ndarray, faces: np.ndarray, num_points: int, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Area-weighted mesh sampling -> (points [n,3], normals [n,3])."""
    lib = _load()
    assert lib is not None, "native library not built"
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    pts = np.empty((num_points, 3), np.float32)
    nrm = np.empty((num_points, 3), np.float32)
    lib.geoa3_sample_mesh(
        _fptr(v), v.shape[0], _iptr(f), f.shape[0], num_points,
        ctypes.c_uint64(seed), _fptr(pts), _fptr(nrm),
    )
    return pts, nrm


def normalize(points: np.ndarray) -> np.ndarray:
    """Centre + unit-sphere normalise [n,3] (in a copy)."""
    lib = _load()
    assert lib is not None, "native library not built"
    pts = np.ascontiguousarray(points, np.float32).copy()
    lib.geoa3_normalize(_fptr(pts), pts.shape[0])
    return pts
