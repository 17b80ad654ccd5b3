"""ctypes bindings for the native post-processing library.

The shared library is built on demand by `build()` (g++ -O3); if the
toolchain or binary is unavailable every entry point reports
`available() == False` and pure-Python fallbacks are used.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "crop.cc")
_LIB_PATH = os.path.join(_DIR, "libstabnet_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the native library.  Returns True on success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.max_clear_rect.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.max_clear_rect.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def max_clear_rect(black: np.ndarray) -> Tuple[int, int, int, int]:
    lib = _load()
    assert lib is not None, "native library unavailable"
    arr = np.ascontiguousarray(np.asarray(black), dtype=np.int64)
    H, W = arr.shape
    out = np.zeros(5, np.int64)
    lib.max_clear_rect(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        H, W,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if out[4] == 0:
        raise ValueError("no black-free pixel; cannot crop")
    return int(out[0]), int(out[1]), int(out[2]), int(out[3])
