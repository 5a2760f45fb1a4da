"""Native (C++) host-precompute backend, loaded via ctypes.

Compiled on first use with g++ (cached as ``libfusgeom.so`` next to the
source); everything degrades gracefully to the numpy implementations when
the toolchain is unavailable. The compute path on device is JAX/XLA/Pallas —
this layer is the analogue of the reference's host-side C++ precompute
(``cpp/*/common/precompute.hpp``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "geometry.cpp")
_LIB = os.path.join(_DIR, "libfusgeom.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("FUS_NATIVE", "1") == "0":
        return None
    try:
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                [
                    "g++",
                    "-O3",
                    "-march=native",
                    "-shared",
                    "-fPIC",
                    "-std=c++17",
                    "-o",
                    _LIB,
                    _SRC,
                    "-lpthread",
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.fus_volume_factors.restype = ctypes.c_int
        lib.fus_volume_factors.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def volume_factors(verts: np.ndarray, qpts: np.ndarray, qwts: np.ndarray):
    """Native geometry factors: verts [Nc, 2^d, d], qpts [Nq, d], qwts [Nq]
    → (wdetJ [Nc, Nq], G [Nc, Nq, nsym]); returns None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float64)
    qpts = np.ascontiguousarray(qpts, np.float64)
    qwts = np.ascontiguousarray(qwts, np.float64)
    nc, nv, d = verts.shape
    nq = qpts.shape[0]
    nsym = d * (d + 1) // 2
    wdetJ = np.empty((nc, nq), np.float64)
    G = np.empty((nc, nq, nsym), np.float64)
    nthreads = min(os.cpu_count() or 1, 16)
    rc = lib.fus_volume_factors(
        _ptr(verts), _ptr(qpts), _ptr(qwts), nc, nq, d, _ptr(wdetJ), _ptr(G),
        nthreads,
    )
    if rc != 0:
        return None
    return wdetJ, G
