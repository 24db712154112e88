"""ctypes bindings for the native async PNG frame writer (native/frame_writer.cpp).

Auto-builds the shared library on first use when a toolchain is present;
falls back to synchronous PIL writes otherwise. Frames are submitted as
uint8 RGB arrays and encoded/written on background C++ threads, keeping the
device-stepping thread free (the reference encodes synchronously per step,
cgd/script_util.py:93-101)."""

from __future__ import annotations

import atexit
import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = os.path.join(_native_dir(), "libcgd_frameio.so")
        if not os.path.exists(so):
            try:
                subprocess.run(
                    ["make", "-C", _native_dir()], check=True, capture_output=True, timeout=120
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(so)
            lib.fw_submit.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
            ]
            lib.fw_init(ctypes.c_int(2))
            atexit.register(lib.fw_shutdown)
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def submit_png(rgb_u8: np.ndarray, path: str) -> bool:
    """Queue an async PNG write. rgb_u8: [H,W,3] uint8 contiguous.
    Returns False if the native writer is unavailable (caller should fall
    back to PIL)."""
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(rgb_u8, dtype=np.uint8)
    h, w = arr.shape[:2]
    ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    rc = lib.fw_submit(ptr, h, w, path.encode())
    return rc == 0


def flush() -> None:
    lib = _load()
    if lib is not None:
        lib.fw_flush()


def error_count() -> int:
    lib = _load()
    return 0 if lib is None else int(lib.fw_errors())
