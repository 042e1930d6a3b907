"""ctypes binding for the C++/OpenMP host MAS (native/mas.cpp).

Host-side counterpart of the reference's Cython extension
(`monotonic_align/__init__.py:6-19` + `core.pyx`), compiled lazily with g++
on first use. Used for CPU preprocessing and as a correctness oracle; the
training hot path runs on-device (mas.py / mas_pallas.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "mas.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libmas.so")


def _build() -> str:
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _build()
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
    return _lib


def maximum_path_native(neg_cent: np.ndarray,
                        mask: np.ndarray) -> np.ndarray:
    """Host MAS: neg_cent, mask [B, T_y, T_x] numpy -> 0/1 path float32."""
    lib = _get_lib()
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
