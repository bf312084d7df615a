"""ctypes loader/builder for the native host runtime (native/mrhash_host.cpp).

Builds the shared library with g++ on first use (cached next to the source)
and exposes numpy-friendly wrappers.  Every entry point has a pure-numpy
fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "mrhash_host.cpp")
_LIB = os.path.join(_ROOT, "native", "libmrhash_host.so")
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.mrhash_dedup_vertices.restype = ctypes.c_int64
        lib.mrhash_dedup_vertices.argtypes = [f64p, ctypes.c_int64,
                                              ctypes.c_double, i64p]
        lib.mrhash_dedup_faces.restype = ctypes.c_int64
        lib.mrhash_dedup_faces.argtypes = [i64p, ctypes.c_int64, u8p]
        lib.mrhash_write_mesh_ply.restype = ctypes.c_int
        lib.mrhash_write_mesh_ply.argtypes = [ctypes.c_char_p, f64p,
                                              ctypes.c_int64, u8p, i64p,
                                              ctypes.c_int64]
        lib.mrhash_estimate_normals.restype = None
        lib.mrhash_estimate_normals.argtypes = [f64p, ctypes.c_int64,
                                                ctypes.c_double,
                                                ctypes.c_double, f32p, f32p]
        _lib = lib
    except Exception as e:  # no toolchain / build failure -> numpy fallback
        print(f"mrhash native library unavailable ({e}); using numpy paths")
        _lib = None
    return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def dedup_vertices(verts: np.ndarray, eps: float):
    """Returns (remap int64[n] first-occurrence order, n_unique) or None."""
    lib = load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float64)
    remap = np.empty(v.shape[0], np.int64)
    n_unique = lib.mrhash_dedup_vertices(
        _ptr(v, ctypes.c_double), v.shape[0], float(eps),
        _ptr(remap, ctypes.c_int64))
    return remap, int(n_unique)


def dedup_faces(faces: np.ndarray):
    """Returns keep mask bool[n] (degenerates + duplicates dropped), or
    None."""
    lib = load()
    if lib is None:
        return None
    f = np.ascontiguousarray(faces, np.int64)
    keep = np.empty(f.shape[0], np.uint8)
    lib.mrhash_dedup_faces(_ptr(f, ctypes.c_int64), f.shape[0],
                           _ptr(keep, ctypes.c_uint8))
    return keep.astype(bool)


def write_mesh_ply(path, verts, colors, faces):
    lib = load()
    if lib is None:
        return False
    v = np.ascontiguousarray(verts, np.float64)
    c = np.ascontiguousarray(np.clip(colors, 0, 255), np.uint8)
    f = np.ascontiguousarray(faces, np.int64)
    rc = lib.mrhash_write_mesh_ply(
        str(path).encode(), _ptr(v, ctypes.c_double), v.shape[0],
        _ptr(c, ctypes.c_uint8), _ptr(f, ctypes.c_int64), f.shape[0])
    return rc == 0


def estimate_normals(points, b_max=0.4, b_min=0.4):
    """Native MADtree.  Returns (normals f32[n,3], weights f32[n]) or
    None."""
    lib = load()
    if lib is None:
        return None
    p = np.ascontiguousarray(points, np.float64)
    normals = np.zeros((p.shape[0], 3), np.float32)
    weights = np.zeros((p.shape[0],), np.float32)
    lib.mrhash_estimate_normals(_ptr(p, ctypes.c_double), p.shape[0],
                                float(b_max), float(b_min),
                                _ptr(normals, ctypes.c_float),
                                _ptr(weights, ctypes.c_float))
    return normals, weights
