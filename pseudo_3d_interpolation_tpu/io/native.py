"""ctypes loader for the native SEG-Y core (native/segy_core.cpp).

Builds lazily with ``make -C native`` if g++ is present and the library is
missing; falls back silently to the numpy codec otherwise. Public surface:
``lib()`` returns the loaded CDLL or None.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libp3dsegy.so")

_lib = None
_tried = False


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def lib():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.path.isdir(_NATIVE_DIR):
        # run make unconditionally: it no-ops when the .so is newer than
        # the source, and rebuilds after a segy_core.cpp edit — loading a
        # stale (or foreign-host -march=native) binary silently is worse
        # than the ~10 ms make overhead once per process
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        cdll = ctypes.CDLL(_LIB_PATH)
        cdll.ibm2ieee_buffer.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        cdll.ieee2ibm_buffer.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        cdll.decode_traces.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_void_p]
        cdll.decode_traces.restype = ctypes.c_int
        cdll.header_column.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_void_p]
        cdll.header_column.restype = ctypes.c_int
        _lib = cdll
    except OSError:
        _lib = None
    return _lib
