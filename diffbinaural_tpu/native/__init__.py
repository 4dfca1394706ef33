"""ctypes bindings for the native audio data path (see audio_native.cpp).

The shared library is compiled on first import (g++, cached next to the
source); every entry point degrades gracefully to the scipy/numpy
implementations in data.audio_io when the toolchain or binary is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "audio_native.cpp")
_LIB = os.path.join(_HERE, "libaudio_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # pragma: no cover
        print(f"[native] build failed ({e}); using python fallback")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:  # pragma: no cover
            return None
        lib.wav_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wav_probe.restype = ctypes.c_int
        lib.wav_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.wav_decode.restype = ctypes.c_int64
        lib.peak_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ]
        lib.resample_poly.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float, ctypes.c_int32,
        ]
        lib.resample_poly.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_wav_native(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """→ (audio float32 (T,) or (C, T), sr) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    frames = ctypes.c_int64()
    if lib.wav_probe(path.encode(), ctypes.byref(ch), ctypes.byref(sr),
                     ctypes.byref(frames)) != 0:
        return None
    out = np.empty((ch.value, frames.value), np.float32)
    n = lib.wav_decode(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames.value,
    )
    if n < 0:
        return None
    out = out[:, :n]
    return (out[0] if ch.value == 1 else out), sr.value


def peak_normalize_native(x: np.ndarray, level: float = 0.95) -> np.ndarray:
    lib = get_lib()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        peak = np.abs(x).max()
        return x if peak < 1e-10 else x / peak * level
    lib.peak_normalize(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size, level
    )
    return x


def resample_native(x: np.ndarray, up: int, down: int,
                    beta: float = 8.555, half_taps: int = 10
                    ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out_len = (len(x) * up + down - 1) // down
    out = np.empty(out_len, np.float32)
    n = lib.resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        up, down, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        beta, half_taps,
    )
    return out[:n] if n > 0 else None
