"""ctypes binding for the native audio runtime (audio_native.cpp).

Builds lazily with the in-tree Makefile on first use if the shared library
is missing and a toolchain is available; callers fall back to the
pure-Python path when unavailable (audio/io.py)."""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libwhisper_audio.so"
_lock = threading.Lock()
_lib = None
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists() and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-s"], cwd=_DIR, check=True, capture_output=True
                )
            except Exception:
                return None
        if not _LIB_PATH.exists():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.wr_load_audio.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wr_load_audio.restype = ctypes.c_int
        lib.wr_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wr_resample.restype = ctypes.c_int
        lib.wr_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.wr_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_audio(path: str) -> Optional[np.ndarray]:
    """Decode + resample via the native library; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.wr_load_audio(path.encode(), ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        raise RuntimeError(
            f"native audio decode failed: {lib.wr_last_error().decode()}"
        )
    try:
        return np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.wr_free(out)


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.wr_resample(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.size,
        sr_in,
        sr_out,
        ctypes.byref(out),
        ctypes.byref(n),
    )
    if rc != 0:
        raise RuntimeError(
            f"native resample failed: {lib.wr_last_error().decode()}"
        )
    try:
        return np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.wr_free(out)
