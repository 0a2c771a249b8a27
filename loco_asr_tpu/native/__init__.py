"""ctypes binding for the native audio ingest core (loco_audio.cc).

Builds the shared library on first use (g++ -O3) and caches it next to the
source; every entry point has a numpy fallback in ops/audio.py, so the
framework works without a toolchain (the native path is the fast ingest
lane for corpus-scale preparation).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loco_audio.cc")
_LIB_PATH = os.path.join(_HERE, "libloco_audio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        c_char_p, c_i32p, c_i64p = ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.la_sphere_info.argtypes = [c_char_p, c_i32p, c_i32p, c_i64p]
        lib.la_sphere_info.restype = ctypes.c_int
        lib.la_sphere_read.argtypes = [c_char_p, ctypes.c_int, f32p, ctypes.c_int64]
        lib.la_sphere_read.restype = ctypes.c_int64
        lib.la_wav_info.argtypes = [c_char_p, c_i32p, c_i32p, c_i64p]
        lib.la_wav_info.restype = ctypes.c_int
        lib.la_wav_read.argtypes = [c_char_p, f32p, ctypes.c_int64]
        lib.la_wav_read.restype = ctypes.c_int64
        lib.la_resample_len.argtypes = [ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
        lib.la_resample_len.restype = ctypes.c_int64
        lib.la_resample.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                                    ctypes.c_int32, f32p, ctypes.c_int64]
        lib.la_resample.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def read_sphere(path: str, channel: Optional[int] = None) -> Tuple[np.ndarray, int]:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rate = ctypes.c_int32()
    channels = ctypes.c_int32()
    n = ctypes.c_int64()
    rc = lib.la_sphere_info(path.encode(), ctypes.byref(rate),
                            ctypes.byref(channels), ctypes.byref(n))
    if rc < 0:
        raise ValueError(f"{path}: sphere decode failed ({rc})")
    # rc == 1: n is an ESTIMATE (shorten payload without a sample_count
    # header — exact counting would decode the stream twice); grow the
    # buffer on -3 (cap exceeded) until the single decode fits.
    cap = max(int(n.value), 4096)
    ch = -1 if channel is None else channel
    while True:
        out = np.empty(cap, np.float32)
        got = lib.la_sphere_read(path.encode(), ch, out, cap)
        if got == -3 and rc == 1:
            cap *= 4
            continue
        if got < 0:
            raise ValueError(f"{path}: sphere read failed ({got})")
        return out[:got], rate.value


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rate = ctypes.c_int32()
    channels = ctypes.c_int32()
    n = ctypes.c_int64()
    rc = lib.la_wav_info(path.encode(), ctypes.byref(rate),
                         ctypes.byref(channels), ctypes.byref(n))
    if rc < 0:
        raise ValueError(f"{path}: wav decode failed ({rc})")
    out = np.empty(n.value, np.float32)
    got = lib.la_wav_read(path.encode(), out, n.value)
    if got < 0:
        raise ValueError(f"{path}: wav read failed ({got})")
    return out[:got], rate.value


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    cap = lib.la_resample_len(len(x), sr_in, sr_out)
    out = np.empty(cap, np.float32)
    got = lib.la_resample(x, len(x), sr_in, sr_out, out, cap)
    if got < 0:
        raise ValueError(f"resample failed ({got})")
    return out[:got]
