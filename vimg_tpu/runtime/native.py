"""ctypes bindings for the native (C++) runtime components.

The shared library is compiled on first use with g++ -O3 and cached next to
the source; the numpy implementations remain as always-available fallbacks
(and correctness oracles in tests).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LOCK = threading.Lock()
_LIB = None


def _compile_lib() -> Path:
    src = _HERE / "bvh_builder.cpp"
    out = _HERE / "libvimg_runtime.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(src), "-o", str(out)]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            path = _compile_lib()
            lib = ctypes.CDLL(str(path))
            lib.vimg_build_bvh_mode.restype = ctypes.c_int32
            lib.vimg_build_bvh_mode.argtypes = [
                ctypes.c_int32, ctypes.c_int32,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            _LIB = lib
    return _LIB


def build_bvh_native(bmin, bmax, centers, mode=0):
    """Same contract as geometry.bvh.build_bvh_numpy, but in C++.
    mode: 0 = binned SAH, 1 = exact sweep SAH (reference -b flag)."""
    lib = get_lib()
    n = np.int32(bmin.shape[0])
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    centers = np.ascontiguousarray(centers, np.float32)
    cap = 2 * int(n)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    start = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    skip = np.empty(cap, np.int32)
    order = np.empty(int(n), np.int32)
    n_nodes = lib.vimg_build_bvh_mode(n, np.int32(mode), bmin, bmax, centers,
                                      node_min, node_max, start, count, skip,
                                      order)
    if n_nodes < 0:
        raise RuntimeError("native BVH build failed")
    return dict(node_min=node_min[:n_nodes], node_max=node_max[:n_nodes],
                node_start=start[:n_nodes], node_count=count[:n_nodes],
                node_skip=skip[:n_nodes], order=order)
