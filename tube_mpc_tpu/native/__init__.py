"""Native C++ oracle bindings (ctypes; auto-built with g++ on first use).

An independent, dependency-free double-precision implementation of the Riccati
backward sweep and the active-set DDP sensitivity (native/riccati_oracle.cpp) used for
DIFFERENTIAL TESTING of the XLA scan path and the Pallas lane kernels — three
implementations of the same math cross-checked in tests/test_native_oracle.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "riccati_oracle.cpp")
_LIB = os.path.join(_DIR, "libriccati_oracle.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True,
        capture_output=True,
    )


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    dp = ctypes.POINTER(ctypes.c_double)
    sp = ctypes.POINTER(ctypes.c_byte)
    lib.riccati_backward.argtypes = [dp] * 9 + [ctypes.c_double] + [ctypes.c_int] * 3 + [dp] * 2
    lib.riccati_backward.restype = None
    lib.ddp_sensitivity_oracle.argtypes = (
        [dp] * 8 + [sp, ctypes.c_double] + [ctypes.c_int] * 3 + [dp] * 3
    )
    lib.ddp_sensitivity_oracle.restype = None
    _lib = lib
    return lib


def _c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def riccati_backward(A, B, lx, lu, lxx, luu, lux, phix, phixx, reg: float):
    """Oracle backward sweep; all inputs numpy float64. Returns (K [N,m,n], kff [N,m])."""
    lib = load()
    A = np.ascontiguousarray(A, dtype=np.float64)
    N, n, _ = A.shape
    m = B.shape[-1]
    args = [np.ascontiguousarray(x, dtype=np.float64) for x in (B, lx, lu, lxx, luu, lux, phix, phixx)]
    K = np.zeros((N, m, n), dtype=np.float64)
    kff = np.zeros((N, m), dtype=np.float64)
    lib.riccati_backward(
        _c(A), *[_c(a) for a in args], ctypes.c_double(reg),
        N, n, m, _c(K), _c(kff),
    )
    return K, kff


def ddp_sensitivity(A, B, lxx, luu, lux, phixx, gx, gu, active, reg: float):
    """Oracle δz solve. active: bool [N, m]. Returns (dX, dU, dlam)."""
    lib = load()
    A = np.ascontiguousarray(A, dtype=np.float64)
    N, n, _ = A.shape
    m = B.shape[-1]
    arrs = [np.ascontiguousarray(x, dtype=np.float64) for x in (B, lxx, luu, lux, phixx, gx, gu)]
    act = np.ascontiguousarray(active, dtype=np.int8)
    dX = np.zeros((N + 1, n), dtype=np.float64)
    dU = np.zeros((N, m), dtype=np.float64)
    dlam = np.zeros((N + 1, n), dtype=np.float64)
    lib.ddp_sensitivity_oracle(
        _c(A), *[_c(a) for a in arrs],
        act.ctypes.data_as(ctypes.POINTER(ctypes.c_byte)),
        ctypes.c_double(reg), N, n, m, _c(dX), _c(dU), _c(dlam),
    )
    return dX, dU, dlam
