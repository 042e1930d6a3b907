"""Lazy g++ build for the native/ helpers, shared by every ctypes
binding (data/native_audio.py, ops/mas_native.py).

Atomicity matters: multiple processes on one checkout (multi-process
launchers, tests beside training) may race the build. Compiling straight
to the target path can leave a half-written .so whose mtime passes the
freshness check forever — silently disabling the native path until
someone deletes the file. Compile to a per-pid temp name and
os.replace() it in; concurrent builders each produce a complete .so and
the last rename wins."""

from __future__ import annotations

import os
import subprocess


def build_shared_lib(src: str, so: str) -> str:
    """Compile `src` to `so` if missing/stale; atomic under concurrent
    processes. Raises CalledProcessError/OSError on toolchain failure
    (callers decide their fallback policy)."""
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    tmp = f"{so}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", src, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, so)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return so
