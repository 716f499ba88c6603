"""ctypes bindings for the native host-side runtime (native/neighbor_list.cpp).

The library is built on demand with g++ (no pybind11 dependency) and cached
next to the sources. Falls back gracefully (raises ImportError) when no
compiler is available; callers then use the jitted O(N^2) builder.
"""
import ctypes
import functools
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'native')


@functools.lru_cache(maxsize=None)
def _lib():
    so = os.path.join(_NATIVE_DIR, 'libmbpol_native.so')
    src = os.path.join(_NATIVE_DIR, 'neighbor_list.cpp')
    if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(['g++', '-O2', '-fPIC', '-shared', '-std=c++17',
                        '-o', so, src], check=True)
    lib = ctypes.CDLL(so)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    for name in ('mbpol_pair_list', 'mbpol_triplet_list'):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_double, ip, ctypes.c_int64]
    return lib


def _box_ptr(box):
    if box is None:
        return None, ctypes.POINTER(ctypes.c_double)()
    b = np.ascontiguousarray(np.asarray(box, np.float64))
    return b, b.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def pair_list(o_pos, box, cutoff, capacity=None):
    """Host O(N) voxel-hash pair list. Returns (pairs [P,2] int32, n_found)."""
    pos = np.ascontiguousarray(np.asarray(o_pos, np.float64))
    n = len(pos)
    capacity = capacity or n * 64
    out = np.zeros((capacity, 2), np.int32)
    keep, bp = _box_ptr(box)
    found = _lib().mbpol_pair_list(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, bp,
        float(cutoff), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        capacity)
    return out[:min(found, capacity)], int(found)


def triplet_list(o_pos, box, cutoff, capacity=None):
    """Host O(N) triplet list (all >= 2-edge triplets, each once)."""
    pos = np.ascontiguousarray(np.asarray(o_pos, np.float64))
    n = len(pos)
    capacity = capacity or n * 256
    out = np.zeros((capacity, 3), np.int32)
    keep, bp = _box_ptr(box)
    found = _lib().mbpol_triplet_list(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, bp,
        float(cutoff), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        capacity)
    return out[:min(found, capacity)], int(found)
