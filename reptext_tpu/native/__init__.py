"""Native (C++) host-side components, loaded via ctypes.

Build on demand with :func:`ensure_built`; falls back gracefully when no
toolchain is available (pure-Python/numpy implementations remain the
reference).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libreptext_native.so")
_SRC = os.path.join(_HERE, "canny.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def ensure_built() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SRC) > os.path.getmtime(_SO_PATH)
        ):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.canny_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_void_p,
            ]
            lib.canny_u8.restype = None
            _lib = lib
            return _lib
        except OSError:
            _build_failed = True
            return None


def native_available() -> bool:
    return ensure_built() is not None
