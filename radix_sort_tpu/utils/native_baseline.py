"""ctypes bridge to the native C++ host baselines (native/host_baseline.cpp).

The reference times two host references per run — ``std::sort`` and its
scalar CPU radix sort (``src/CRadixSortTask.cpp:172-222``) — and those times
fill the ``avgTotalSTLCPU`` / ``avgTotalRDXCPU`` CSV columns.  NumPy's sort
is a fine stand-in for correctness, but for honest baseline *timing* parity
we provide real compiled C++ equivalents: ``std::sort`` itself and a scalar
LSD radix sort, built as a tiny shared library (see native/Makefile) and
loaded here via ctypes (no pybind11 in this image).

Falls back with ImportError if the library hasn't been built; callers catch
and use the numpy golden instead.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is None:
        path = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                            "native", "libhostbaseline.so")
        path = os.path.abspath(path)
        if not os.path.exists(path):
            raise ImportError(f"native baseline library not built: {path} "
                              "(run `make -C native`)")
        _LIB = ctypes.CDLL(path)
        for name in ("std_sort_u32", "radix_sort_u32"):
            getattr(_LIB, name).argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_size_t]
        for name in ("std_sort_u64", "radix_sort_u64"):
            getattr(_LIB, name).argtypes = [
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t]
        _LIB.radix_sort_kv_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_size_t]
    return _LIB


def available() -> bool:
    try:
        _load()
        return True
    except ImportError:
        return False


def _biased_u(keys: np.ndarray) -> np.ndarray:
    from .. import dtypes
    return dtypes.np_to_sortable_unsigned(np.ascontiguousarray(keys))


def std_sort(keys: np.ndarray) -> np.ndarray:
    """In-C++ std::sort on the biased unsigned image; returns sorted keys in
    the original dtype."""
    from .. import dtypes
    lib = _load()
    u = _biased_u(keys).copy()
    if u.dtype.itemsize == 4:
        lib.std_sort_u32(u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                         u.size)
    elif u.dtype.itemsize == 8:
        lib.std_sort_u64(u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                         u.size)
    else:
        raise TypeError(f"unsupported itemsize {u.dtype.itemsize}")
    return dtypes.np_from_sortable_unsigned(u, keys.dtype)


def radix_sort(keys: np.ndarray) -> np.ndarray:
    """Native scalar LSD radix sort (the RadixSortCPU-equivalent baseline)."""
    from .. import dtypes
    lib = _load()
    u = _biased_u(keys).copy()
    if u.dtype.itemsize == 4:
        lib.radix_sort_u32(u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                           u.size)
    elif u.dtype.itemsize == 8:
        lib.radix_sort_u64(u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                           u.size)
    else:
        raise TypeError(f"unsupported itemsize {u.dtype.itemsize}")
    return dtypes.np_from_sortable_unsigned(u, keys.dtype)


def radix_sort_kv_u32(keys: np.ndarray, vals: np.ndarray):
    lib = _load()
    from .. import dtypes
    u = _biased_u(keys).copy()
    v = np.ascontiguousarray(vals, dtype=np.uint32).copy()
    lib.radix_sort_kv_u32(
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), u.size)
    return dtypes.np_from_sortable_unsigned(u, keys.dtype), v


def radix_sort_fn(keys: np.ndarray):
    """A zero-arg callable timing one native radix sort of ``keys``."""
    lib = _load()  # raises if unavailable
    del lib

    def run():
        radix_sort(keys)

    return run
