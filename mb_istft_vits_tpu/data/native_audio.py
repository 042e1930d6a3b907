"""ctypes binding for the native audio loader (native/audio.cpp).

The C++/OpenMP counterpart of the reference's torch DataLoader worker path
(data_utils.py:78-86: wav read -> spectrogram_torch), compiled lazily with
g++ on first use. ctypes releases the GIL during the C calls, so the
threaded Prefetcher gets true parallelism out of these.

Falls back cleanly: `available()` is False when g++ or the toolchain is
missing, and the per-file readers return None for unsupported containers
(non-mono / compressed wavs), letting the Python path take over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "audio.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libaudio.so")


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is None and not _build_failed:
            try:
                from mb_istft_vits_tpu.utils.native_build import (
                    build_shared_lib,
                )

                build_shared_lib(_SRC, _SO)
                lib = ctypes.CDLL(_SO)
                lib.wav_info.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(ctypes.c_int)]
                lib.wav_info.restype = ctypes.c_long
                lib.wav_read.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(ctypes.c_float),
                                         ctypes.c_long]
                lib.wav_read.restype = ctypes.c_long
                lib.spectrogram_f32.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float),
                ]
                lib.spectrogram_f32.restype = ctypes.c_long
                _lib = lib
            except (OSError, subprocess.CalledProcessError):
                _build_failed = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def load_wav(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """(raw float32 samples, sample_rate) like scipy.io.wavfile.read on a
    PCM16 mono wav, or None when unsupported (caller falls back)."""
    lib = _get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int(0)
    n = lib.wav_info(path.encode(), ctypes.byref(sr))
    if n < 0:
        return None
    out = np.empty(n, np.float32)
    got = lib.wav_read(path.encode(),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got != n:
        return None
    return out, sr.value


def spectrogram(y: np.ndarray, n_fft: int, hop: int,
                win: int) -> Optional[np.ndarray]:
    """Linear magnitude spectrogram [frames, n_fft//2+1] matching
    dsp.spectrogram (reference mel_processing.py:51-70 semantics), or None
    when n_fft is not a power of two."""
    lib = _get_lib()
    if lib is None or (n_fft & (n_fft - 1)) or win > n_fft:
        return None
    y = np.ascontiguousarray(y, np.float32)
    p = (n_fft - hop) // 2
    frames = 1 + (len(y) + 2 * p - n_fft) // hop
    if frames <= 0:
        return None
    out = np.empty((frames, n_fft // 2 + 1), np.float32)
    got = lib.spectrogram_f32(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y),
        n_fft, hop, win, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got != frames:
        return None
    return out
