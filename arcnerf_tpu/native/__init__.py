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


def _build_lib():
    src = os.path.join(_DIR, "mesh_extract.cpp")
    out = os.path.join(_DIR, "libarcnerf_native.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", out, src]
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
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available():
    return get_lib() is not None


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
