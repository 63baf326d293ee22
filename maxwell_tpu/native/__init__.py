"""Native (C++) host runtime components, loaded via ctypes (SURVEY.md §2
native checklist; pybind11 is not available in this image).

Compiled on first import with g++ -O3 into a cached shared library next to
the source. Every entry point has a pure-Python/scipy fallback so the
package works without a toolchain; `HAVE_NATIVE` reports which path is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native.cpp")
_LIB = os.path.join(_HERE, "_native.so")

_lib = None


def _build() -> None:
    # build to a temp name + atomic rename so concurrent importers never
    # load a half-written .so
    tmp = _LIB + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", tmp, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _LIB)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB)) or os.path.getmtime(
            _LIB
        ) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
    except Exception:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.bell_from_csr.restype = ctypes.c_int64
    lib.bell_from_csr.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i64p, i32p, f64p, f64p, i32p,
    ]
    lib.level_schedule.restype = ctypes.c_int64
    lib.level_schedule.argtypes = [
        ctypes.c_int64, i64p, i32p, ctypes.c_int, i64p,
    ]
    lib.ldlt_symbolic.restype = ctypes.c_int64
    lib.ldlt_symbolic.argtypes = [ctypes.c_int64, i64p, i32p, i64p, i64p]
    lib.ldlt_numeric.restype = ctypes.c_int64
    lib.ldlt_numeric.argtypes = [
        ctypes.c_int64, i64p, i32p, f64p, i64p, i64p, i32p, f64p, f64p,
    ]
    _lib = lib
    return lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


HAVE_NATIVE = _load() is not None


def bell_from_csr(indptr, indices, data, n: int, b: int, S: int):
    """Fill blocked-ELL (blocks, cols) from CSR. Returns (blocks, cols,
    max_slots_used) with float64 blocks; caller casts."""
    lib = _load()
    nbr = n // b
    blocks = np.zeros((nbr, S, b, b), dtype=np.float64)
    cols = np.zeros((nbr, S), dtype=np.int32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float64)
    used = lib.bell_from_csr(
        n, b, S,
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(data, ctypes.c_double), _ptr(blocks, ctypes.c_double),
        _ptr(cols, ctypes.c_int32),
    )
    if used < 0:
        raise ValueError("slot count S too small for matrix structure")
    return blocks, cols, int(used)


def level_schedule_levels(indptr, indices, n: int, lower: bool):
    """Row dependency levels for a triangular CSR. Returns (levels, nlevels)."""
    lib = _load()
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    levels = np.zeros(n, dtype=np.int64)
    nl = lib.level_schedule(
        n, _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        1 if lower else 0, _ptr(levels, ctypes.c_int64),
    )
    return levels, int(nl)


def ldlt_factor(A_upper_csc):
    """Sparse LDL^T of symmetric A given its upper triangle in CSC.

    Returns (Lp, Li, Lx, D) with L unit-lower in CSC (diagonal implicit).
    Raises ZeroDivisionError on a zero pivot (caller falls back to LU).
    """
    import scipy.sparse as sp

    lib = _load()
    A = sp.csc_matrix(A_upper_csc)
    A.sort_indices()
    n = A.shape[0]
    Ap = np.ascontiguousarray(A.indptr, dtype=np.int64)
    Ai = np.ascontiguousarray(A.indices, dtype=np.int32)
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)

    parent = np.zeros(n, dtype=np.int64)
    counts = np.zeros(n, dtype=np.int64)
    total = lib.ldlt_symbolic(
        n, _ptr(Ap, ctypes.c_int64), _ptr(Ai, ctypes.c_int32),
        _ptr(parent, ctypes.c_int64), _ptr(counts, ctypes.c_int64),
    )
    Lp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=Lp[1:])
    Li = np.zeros(total, dtype=np.int32)
    Lx = np.zeros(total, dtype=np.float64)
    D = np.zeros(n, dtype=np.float64)
    bad = lib.ldlt_numeric(
        n, _ptr(Ap, ctypes.c_int64), _ptr(Ai, ctypes.c_int32),
        _ptr(Ax, ctypes.c_double), _ptr(parent, ctypes.c_int64),
        _ptr(Lp, ctypes.c_int64), _ptr(Li, ctypes.c_int32),
        _ptr(Lx, ctypes.c_double), _ptr(D, ctypes.c_double),
    )
    if bad >= 0:
        raise ZeroDivisionError(f"zero pivot at column {bad}")
    return Lp, Li, Lx, D
