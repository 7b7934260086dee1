"""Native (C++) host-runtime components with lazy self-compilation.

The TPU compute path is jnp/Pallas; host-side hot loops (large-grid mesh
extraction) get tight C++ implementations, built on first use with g++ and
cached next to the source. Everything degrades to the python implementation
when the toolchain is missing.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


_SOURCES = ("mesh_extract.cpp", "mc_extract.cpp", "qem_simplify.cpp")


def _build_lib():
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    out = os.path.join(_DIR, "libarcnerf_native.so")
    if os.path.exists(out) and all(os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", out] + srcs
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        path = _build_lib()
        lib = ctypes.CDLL(path)
        lib.mt_count.restype = ctypes.c_int64
        lib.mt_count.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float
        ]
        lib.mt_extract.restype = ctypes.c_int64
        lib.mt_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.mc_count.restype = ctypes.c_int64
        lib.mc_count.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mc_extract.restype = ctypes.c_int64
        lib.mc_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.qem_simplify.restype = ctypes.c_int64
        lib.qem_simplify.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available():
    return get_lib() is not None


def marching_cubes_native(volume, level, tri_counts, tri_table, edge_corners):
    """C++ marching cubes with the python-generated case table
    (geometry/mc_table.py): (nx, ny, nz) f32 field -> (T, 3, 3) triangles in
    GRID coordinates, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    field = np.ascontiguousarray(volume, dtype=np.float32)
    nx, ny, nz = field.shape
    fptr = field.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    counts = np.ascontiguousarray(tri_counts, dtype=np.int32)
    table = np.ascontiguousarray(tri_table, dtype=np.int32)
    edges = np.ascontiguousarray(edge_corners, dtype=np.int32)
    cptr = counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    n = lib.mc_count(fptr, nx, ny, nz, ctypes.c_float(level), cptr)
    if n == 0:
        return np.zeros((0, 3, 3), dtype=np.float32)
    out = np.empty((n, 9), dtype=np.float32)
    wrote = lib.mc_extract(
        fptr, nx, ny, nz, ctypes.c_float(level), cptr,
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), table.shape[1],
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    return out[:wrote].reshape(-1, 3, 3)


def qem_simplify_native(verts, faces, target_faces):
    """C++ quadric-error-metric simplification -> (verts, faces) or None if
    the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int64)
    nv, nf = v.shape[0], f.shape[0]
    out_v = np.empty((nv, 3), dtype=np.float32)
    out_f = np.empty((nf, 3), dtype=np.int64)
    counts = np.zeros(2, dtype=np.int64)
    rc = lib.qem_simplify(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nv,
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), nf,
        int(target_faces),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return out_v[: counts[0]].copy(), out_f[: counts[1]].copy()


def marching_tets_native(volume, level):
    """C++ marching tets: (nx, ny, nz) f32 field -> (T, 3, 3) triangles in
    GRID coordinates, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    field = np.ascontiguousarray(volume, dtype=np.float32)
    nx, ny, nz = field.shape
    fptr = field.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    n = lib.mt_count(fptr, nx, ny, nz, ctypes.c_float(level))
    if n == 0:
        return np.zeros((0, 3, 3), dtype=np.float32)
    out = np.empty((n, 9), dtype=np.float32)
    wrote = lib.mt_extract(
        fptr, nx, ny, nz, ctypes.c_float(level),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    return out[:wrote].reshape(-1, 3, 3)
