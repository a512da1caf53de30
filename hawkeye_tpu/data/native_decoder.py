"""ctypes bridge to the native JPEG decoder (see ``native/decoder.cpp``).

Builds the shared library on first use (g++ + libjpeg, both baked into the
image); every call releases the GIL, so the loader's thread pool gets true
parallel decode. Falls back to PIL transparently when the toolchain or
libjpeg is unavailable, or per-image on non-JPEG/corrupt inputs.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "decoder.cpp")

_lock = threading.Lock()
_lib = None
_failed = False


def _lib_path():
    """Cache path keyed by the source hash: a binary is only ever loaded if
    it was built from exactly the reviewed source (no stale/foreign .so —
    nothing is committed, see .gitignore)."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "HAWKEYE_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "hawkeye_tpu"))
    return os.path.join(cache, f"libhawkeye_decoder-{digest}.so")


def _build(lib_path):
    os.makedirs(os.path.dirname(lib_path), exist_ok=True)
    tmp = lib_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-o", tmp]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, lib_path)  # atomic vs concurrent builders


def get_lib():
    """Load (building if needed) the native library, or None on failure."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            lib_path = _lib_path()
            if not os.path.exists(lib_path):
                _build(lib_path)
            lib = ctypes.CDLL(lib_path)
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
