"""Native (C++) host-runtime kernels, loaded via ctypes.

Builds ``src/pcgmix_native.cpp`` with g++ on first use (cached next to the
source); every entry point has a NumPy fallback, so the package works
without a toolchain.  See the .cpp header for what is accelerated and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "pcgmix_native.cpp")
_LIB = os.path.join(_HERE, "libpcgmix_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        dp = ctypes.POINTER(ctypes.c_double)
        lib.pcg_sample_entropy.restype = ctypes.c_double
        lib.pcg_sample_entropy.argtypes = [dp, ctypes.c_int64, ctypes.c_int64,
                                           ctypes.c_double]
        lib.pcg_opt_disp_env.restype = ctypes.c_int64
        lib.pcg_opt_disp_env.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int64]
        for name in ("pcg_opt_disp_sum_longer", "pcg_opt_disp_sum_shorter"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [dp, ctypes.c_int64, ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_double_ptr(x: np.ndarray):
    x = np.ascontiguousarray(x, np.float64)
    return x, x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def sample_entropy(y: np.ndarray, order: int, r: float) -> float:
    lib = _load()
    y, ptr = _as_double_ptr(y)
    return float(lib.pcg_sample_entropy(ptr, len(y), order, r))


def opt_disp_env(s_long: np.ndarray, s_short: np.ndarray) -> int:
    lib = _load()
    a, pa = _as_double_ptr(s_long)
    b, pb = _as_double_ptr(s_short)
    return int(lib.pcg_opt_disp_env(pa, len(a), pb, len(b)))
