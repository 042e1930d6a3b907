"""ctypes binding for the C++/OpenMP host MAS (native/mas.cpp).

Host-side counterpart of the reference's Cython extension
(`monotonic_align/__init__.py:6-19` + `core.pyx`), compiled lazily with g++
on first use. Used for CPU preprocessing and as a correctness oracle; the
training hot path runs on-device (mas.py / mas_pallas.py).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "mas.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libmas.so")


def _get_lib() -> Optional[ctypes.CDLL]:
    """None when the toolchain is unavailable (same latch pattern as
    data/native_audio.py): a host-fallback path must itself fall back
    cleanly, not crash on a missing g++."""
    global _lib, _build_failed
    with _lock:
        if _lib is None and not _build_failed:
            try:
                from mb_istft_vits_tpu.utils.native_build import (
                    build_shared_lib,
                )

                build_shared_lib(_SRC, _SO)
                lib = ctypes.CDLL(_SO)
                lib.mas_maximum_path.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ]
                lib.mas_maximum_path.restype = None
                _lib = lib
            except Exception:
                _build_failed = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def maximum_path_native(neg_cent: np.ndarray,
                        mask: np.ndarray) -> np.ndarray:
    """Host MAS: neg_cent, mask [B, T_y, T_x] numpy -> 0/1 path float32.

    Raises RuntimeError when the native library cannot be built — use
    `available()` to choose the on-device implementations
    (ops/mas.py, ops/mas_pallas.py) instead."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(
            "native MAS unavailable (g++/toolchain missing?); use "
            "ops.mas.maximum_path (lax.scan) or ops.mas_pallas instead")
    values = np.ascontiguousarray(
        neg_cent.astype(np.float32) * mask.astype(np.float32)
    )
    b, t_y_max, t_x_max = values.shape
    paths = np.zeros((b, t_y_max, t_x_max), np.int32)
    t_ys = np.ascontiguousarray(
        mask[:, :, 0].sum(axis=1).astype(np.int32))
    t_xs = np.ascontiguousarray(
        mask[:, 0, :].sum(axis=1).astype(np.int32))
    lib.mas_maximum_path(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_y_max, t_x_max,
    )
    return paths.astype(np.float32)
