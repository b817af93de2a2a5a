"""ctypes bindings for the native host runtime (csrc/meshio.cpp).

The shared library is built on demand with g++ (no pybind11 dependency) and
cached next to the source; callers fall back to the pure-Python paths when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "csrc", "meshio.cpp")
_LIB = os.path.join(_ROOT, "csrc", "build", "libmeshio.so")

_lock = threading.Lock()
_lib = None
_failed = False


def _build():
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
        check=True, capture_output=True,
    )


def load():
    """Return the meshio ctypes library, building it if needed; None if
    unavailable (no source / no compiler)."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_SRC):
                raise FileNotFoundError(_SRC)
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            lib.tet_count_faces.argtypes = [i32p, ctypes.c_int32]
            lib.tet_count_faces.restype = ctypes.c_int32
            lib.tet_build_adjacency.argtypes = [
                i32p, ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p,
            ]
            lib.tet_build_adjacency.restype = ctypes.c_int32
            lib.tet_grid_generate.argtypes = [
                ctypes.c_int32, ctypes.c_float, f32p, i32p,
            ]
            lib.tet_grid_generate.restype = None
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def tet_adjacency(tets: np.ndarray):
    """Unique faces + adjacency of a tet mesh, natively if possible.

    Returns (faces (F,3) i32 sorted-vertex rows, face_tets (F,2) i32 -1
    padded, tet_faces (T,4) i32) or None when the native library is
    unavailable.
    """
    lib = load()
    if lib is None:
        return None
    tets = np.ascontiguousarray(tets, dtype=np.int32)
    n_tets = tets.shape[0]
    n_faces = lib.tet_count_faces(tets, n_tets)
    faces = np.empty((n_faces, 3), np.int32)
    face_tets = np.empty((n_faces, 2), np.int32)
    tet_faces = np.empty((n_tets, 4), np.int32)
    wrote = lib.tet_build_adjacency(tets, n_tets, n_faces, faces, face_tets,
                                    tet_faces)
    assert wrote == n_faces
    return faces, face_tets, tet_faces


def tet_grid(res: int, extent: float):
    """Native regular tet grid; returns (verts, tets) or None."""
    lib = load()
    if lib is None:
        return None
    n1 = res + 1
    verts = np.empty((n1 * n1 * n1, 3), np.float32)
    tets = np.empty((res * res * res * 6, 4), np.int32)
    lib.tet_grid_generate(res, float(extent), verts, tets)
    return verts, tets
