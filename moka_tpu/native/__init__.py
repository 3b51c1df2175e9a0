"""Native (C++) host components, loaded via ctypes with lazy compilation.

The reference's only native code is a CUDA extension (SURVEY.md §2.9); this
package holds the TPU-host equivalents for the input-pipeline hot paths
(fbank today).  ``g++ -O3 -shared`` at first use, cached next to the source;
every native function has a numpy twin used as fallback and as the test
cross-check.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB = None
_LIB_FAILED = False


def _build_lib() -> str | None:
    src = os.path.join(_HERE, "fbank.cpp")
    out = os.path.join(_HERE, "libmoka_native.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                        src, "-o", out], check=True, capture_output=True)
        return out
    except Exception:
        return None


def get_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    path = _build_lib()
    if path is None:
        _LIB_FAILED = True
        return None
    lib = ctypes.CDLL(path)
    lib.moka_fbank.restype = ctypes.c_int64
    lib.moka_fbank.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float)]
    lib.moka_fbank_num_frames.restype = ctypes.c_int64
    lib.moka_fbank_num_frames.argtypes = [
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_double]
    _LIB = lib
    return lib


def native_fbank(waveform: np.ndarray, sample_rate: int = 16000,
                 num_mel_bins: int = 128, frame_length_ms: float = 25.0,
                 frame_shift_ms: float = 10.0,
                 preemphasis: float = 0.97) -> np.ndarray | None:
    """C++ fbank; returns None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    wav = np.ascontiguousarray(waveform, np.float32)
    n = lib.moka_fbank_num_frames(len(wav), float(sample_rate),
                                  frame_length_ms, frame_shift_ms)
    out = np.empty((max(n, 0), num_mel_bins), np.float32)
    if n <= 0:
        return out
    wrote = lib.moka_fbank(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        float(sample_rate), num_mel_bins, frame_length_ms, frame_shift_ms,
        preemphasis, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if wrote != n:
        return None
    return out
