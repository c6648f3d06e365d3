"""ctypes bindings for the native C++ IO library (native/ddio.cpp).

The library is built with `make -C native` (g++, no external deps); if the
shared object is missing, loading is attempted once and users fall back to
the pure-numpy readers in io.py transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(build_if_missing: bool = True):
    """Load (building if necessary) libddio; returns None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_repo_root(), "native", "libddio.so")
    if not os.path.exists(so) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.dirname(so)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.dd_read_gauge_header.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32)]
    lib.dd_read_gauge.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int32]
    lib.dd_write_gauge.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_double, ctypes.c_int32]
    lib.dd_read_vector.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
    for fn in (lib.dd_read_gauge_header, lib.dd_read_gauge,
               lib.dd_write_gauge, lib.dd_read_vector):
        fn.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def read_gauge_field(path: str, anti_periodic: bool = True):
    """Native gauge read; returns (re, im [4,T,Z,Y,X,3,3] float64, plaq)
    or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    dims = (ctypes.c_int32 * 4)()
    plaq = ctypes.c_double()
    big = ctypes.c_int32()
    if lib.dd_read_gauge_header(path.encode(), dims, ctypes.byref(plaq),
                                ctypes.byref(big)):
        raise IOError(f"{path}: bad gauge header")
    lt, lz, ly, lx = dims[0], dims[1], dims[2], dims[3]
    shape = (4, lt, lz, ly, lx, 3, 3)
    re = np.empty(shape, dtype=np.float64)
    im = np.empty(shape, dtype=np.float64)
    rc = lib.dd_read_gauge(path.encode(), _dptr(re), _dptr(im),
                           1 if anti_periodic else 0)
    if rc:
        raise IOError(f"{path}: native gauge read failed ({rc})")
    return re, im, float(plaq.value)


def write_gauge_field(path: str, U: np.ndarray, plaquette: float,
                      anti_periodic: bool = True) -> bool:
    lib = load()
    if lib is None:
        return False
    U = np.asarray(U)
    re = np.ascontiguousarray(U.real, dtype=np.float64)
    im = np.ascontiguousarray(U.imag, dtype=np.float64)
    dims = (ctypes.c_int32 * 4)(*U.shape[1:5])
    rc = lib.dd_write_gauge(path.encode(), _dptr(re), _dptr(im), dims,
                            plaquette, 1 if anti_periodic else 0)
    if rc:
        raise IOError(f"{path}: native gauge write failed ({rc})")
    return True
