"""Compile-on-demand loader for the native GF(2) kernels.

The shared library is built from ``native/gf2kernels.cpp`` with g++ the first
time it is needed and cached next to the source; every entry point has a
pure-numpy fallback (encode/gf2.py), so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "gf2kernels.cpp")
_SO = os.path.join(_NATIVE_DIR, "libgf2kernels.so")

_i64 = ctypes.c_int64
_i32p = ctypes.POINTER(ctypes.c_int32)
_u64p = ctypes.POINTER(ctypes.c_uint64)


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_gf2_native():
    """Return the ctypes library or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.gf2_accumulate_batch.argtypes = [_i64, _i32p, _i32p, _u64p, _u64p, _i64]
        lib.gf2_substitute_batch.argtypes = [_i64, _i32p, _i32p, _u64p, _i64, ctypes.c_int]
        lib.gf2_syndrome_batch.argtypes = [_i64, _i32p, _i32p, _u64p, _u64p, _i64]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_gf2_native() is not None
