"""ctypes bridge to the native JPEG decoder (see ``native/decoder.cpp``).

Builds the shared library on first use (g++ + libjpeg, both baked into the
image); every call releases the GIL, so the loader's thread pool gets true
parallel decode. Falls back to PIL transparently when the toolchain or
libjpeg is unavailable, or per-image on non-JPEG/corrupt inputs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "decoder.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libhawkeye_decoder.so")

_lock = threading.Lock()
_lib = None
_failed = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None on failure."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.decode_resize_center.restype = ctypes.c_int
            lib.decode_resize_center.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def decode_resize_center(path: str, target: int) -> np.ndarray | None:
    """Decode a JPEG file → uint8 [target, target, 3] (shorter-side resize +
    center crop). Returns None if the native path can't handle the file
    (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    out = np.empty((target, target, 3), np.uint8)
    rc = lib.decode_resize_center(
        data, len(data), target,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return out
