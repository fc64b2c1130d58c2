"""ctypes loader for the native host kernels (native/host_kernels.cpp).

Builds the shared library on first use (g++, cached next to the source);
callers fall back to the pure-Python implementations when no compiler is
available, so the framework has zero hard native dependencies.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_repo_root(), "native", "host_kernels.cpp")
    so = os.path.join(_repo_root(), "native", "libhostkernels.so")
    try:
        if not os.path.exists(so) or (
            os.path.getmtime(so) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.rs_splitting.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.greedy_coloring.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.greedy_coloring.restype = ctypes.c_int32
        lib.pmis_splitting.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _as_i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def rs_splitting_native(S_csr) -> np.ndarray | None:
    """Native serial RS splitting; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    import scipy.sparse as sp

    S = sp.csr_matrix(S_csr)
    St = S.T.tocsr()
    n = S.shape[0]
    sp_ = _as_i64(S.indptr)
    si = _as_i32(S.indices)
    tp = _as_i64(St.indptr)
    ti = _as_i32(St.indices)
    cf = np.zeros(n, dtype=np.int32)
    lib.rs_splitting(
        _ptr(sp_, ctypes.c_int64), _ptr(si, ctypes.c_int32),
        _ptr(tp, ctypes.c_int64), _ptr(ti, ctypes.c_int32),
        ctypes.c_int64(n), _ptr(cf, ctypes.c_int32),
    )
    return cf


def pmis_splitting_native(srows, scols, w, cf0) -> np.ndarray | None:
    """Native synchronous-round PMIS over a fixed strong-edge list;
    bit-identical to host_setup.np_pmis_splitting (integer weights are
    tie-free).  ``cf0``: initial cf (0 undecided / 2 F for isolated rows),
    not modified.  None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    es = _as_i64(srows)
    ed = _as_i64(scols)
    ww = _as_i64(w)
    cf = np.ascontiguousarray(cf0, dtype=np.int32).copy()
    lib.pmis_splitting(
        _ptr(es, ctypes.c_int64), _ptr(ed, ctypes.c_int64),
        ctypes.c_int64(es.shape[0]), _ptr(ww, ctypes.c_int64),
        ctypes.c_int64(cf.shape[0]), _ptr(cf, ctypes.c_int32),
    )
    return cf


def greedy_coloring_native(indptr, indices, n) -> tuple | None:
    """Native greedy coloring; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    ip = _as_i64(indptr)
    ix = _as_i32(indices)
    color = np.zeros(n, dtype=np.int32)
    nc = lib.greedy_coloring(
        _ptr(ip, ctypes.c_int64), _ptr(ix, ctypes.c_int32),
        ctypes.c_int64(n), _ptr(color, ctypes.c_int32),
    )
    return color, int(nc)
