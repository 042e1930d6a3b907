"""Ahead-of-time compiled-executable cache.

XLA cold compiles are the dominant deploy-time cost of this framework:
the serving programs take minutes per shape bucket and the two train
programs take ~6-10 minutes on first launch. The reference has no
equivalent (PyTorch eager pays no compile, and pays for it in kernel
launch overhead forever after); this module removes the one structural
downside of the compiled-executor design.

`AotCache` persists *compiled XLA executables* — not traces, not
StableHLO — via `jax.experimental.serialize_executable`. A cache hit
skips XLA entirely: the process still traces/lowers the function (a few
seconds, and the lowering is what keys the cache, so staleness is
impossible: any change to the program text, jax version, or device kind
misses), then loads the executable from disk in milliseconds.

Scope: single-device programs only. Multi-device executables do not
round-trip through `deserialize_and_load` on all runtimes (the loaded
executable re-binds to the full local device set), and multi-chip
launches amortize one compile across the whole fleet anyway. Every
failure path — serialize unsupported on a backend, payload unreadable,
signature drift — falls back to the ordinary jitted callable with a
one-time warning; the cache is strictly an accelerator, never a
correctness dependency.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import re
import tempfile
from typing import Any, Callable, Optional

import jax

logger = logging.getLogger(__name__)

# Bump to invalidate every entry (e.g. if the serialized format or the
# wrapper's calling convention changes).
_FORMAT_VERSION = 1


def _platform_fingerprint() -> str:
    from jax.extend import backend as jex_backend

    backend = jex_backend.get_backend()
    parts = [
        jax.__version__,
        backend.platform,
        getattr(backend, "platform_version", ""),
        jax.devices()[0].device_kind,
        str(_FORMAT_VERSION),
    ]
    return "|".join(parts)


def _call_signature(args) -> tuple:
    """Cheap per-call structural key: (shape, dtype) per array leaf,
    Python type per scalar leaf. One jitted function serves several
    input shapes (e.g. the per-frame-bucket infer program is called
    with every text bucket), so executables are cached per signature —
    exactly mirroring jax.jit's own cache keying."""
    sig = []
    for leaf in jax.tree.leaves(args):
        shape = getattr(leaf, "shape", None)
        if shape is None:
            sig.append(type(leaf).__name__)
        else:
            sig.append((tuple(shape), str(getattr(leaf, "dtype", ""))))
    return tuple(sig)


class _AotEntry:
    """One cached program family: lazy compile-or-load per call shape.

    The first invocation at a given signature lowers the jitted
    function against the actual arguments (so the key covers the exact
    program XLA would build) and then either deserializes the stored
    executable or compiles and stores it. Later invocations go straight
    to the loaded executable.
    """

    def __init__(self, cache: "AotCache", name: str, jitted: Callable):
        self._cache = cache
        self._name = name
        self._jitted = jitted
        self._compiled = {}  # signature -> Compiled
        self._fallback = False
        self.source: Optional[str] = None  # "loaded" | "compiled" | "jit"

    def __call__(self, *args):
        if self._fallback:
            return self._jitted(*args)
        sig = _call_signature(args)
        compiled = self._compiled.get(sig)
        if compiled is None:
            compiled = self._materialize(args)
            if compiled is None:  # materialization fell back
                return self._jitted(*args)
            self._compiled[sig] = compiled
        # No call-time fallback: once dispatched, a donating program
        # (g_step donates its state) may already have consumed its input
        # buffers — retrying through plain jit would crash on deleted
        # arrays and mask the real error. A call failure here is a
        # genuine runtime error; every *load/compile* failure path above
        # falls back safely before any buffer is touched.
        return compiled(*args)

    def _materialize(self, args) -> Optional[Callable]:
        try:
            lowered = self._jitted.lower(*args)
            key = self._cache._key(self._name, lowered)
            path = os.path.join(
                self._cache.cache_dir, f"{self._name}-{key}.aotx"
            )
            if os.path.exists(path):
                try:
                    with open(path, "rb") as fh:
                        payload, in_tree, out_tree = pickle.load(fh)
                    from jax.experimental import serialize_executable as se

                    compiled = se.deserialize_and_load(payload, in_tree,
                                                       out_tree)
                    self.source = "loaded"
                    logger.info("aot: loaded %s from %s", self._name, path)
                    return compiled
                except Exception:
                    # unreadable/undeserializable payload (corruption, or
                    # a backend where serialize worked but deserialize
                    # doesn't): DELETE it and recompile over it — leaving
                    # it in place would re-fail every later launch,
                    # permanently re-paying the cold compile this cache
                    # exists to remove
                    logger.warning(
                        "aot: stored executable for %s unreadable; "
                        "deleting %s and recompiling", self._name, path,
                        exc_info=True,
                    )
                    try:
                        os.remove(path)
                    except OSError:
                        pass
            compiled = lowered.compile()
            self.source = "compiled"
            try:
                from jax.experimental import serialize_executable as se

                blob = pickle.dumps(se.serialize(compiled))
                fd, tmp = tempfile.mkstemp(dir=self._cache.cache_dir)
                with os.fdopen(fd, "wb") as fh:
                    fh.write(blob)
                os.replace(tmp, path)  # atomic: concurrent procs race safely
                logger.info("aot: stored %s (%d bytes) at %s",
                            self._name, len(blob), path)
            except Exception:
                logger.warning(
                    "aot: could not serialize %s; it will recompile next "
                    "launch", self._name, exc_info=True,
                )
            return compiled
        except Exception:
            logger.warning(
                "aot: lowering/compile through the cache failed for %s; "
                "falling back to jit", self._name, exc_info=True,
            )
            self._fallback = True
            self.source = "jit"
            return None


class AotCache:
    """Directory-backed cache of serialized XLA executables.

    Usage::

        cache = AotCache("/path/to/aot")
        fast_fn = cache.wrap("infer_b384", jax.jit(fn))
        fast_fn(*args)   # first launch: compiles + stores
                         # later launches: loads in ~ms, skips XLA

    Keys are sha256 of (program StableHLO text, jax version, platform,
    platform version, device kind) — a hit is bit-for-bit the program
    that would have been compiled.
    """

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self._fingerprint = _platform_fingerprint()

    @staticmethod
    def usable() -> bool:
        """Single-device runtimes only (see module docstring) — GLOBAL
        device count: a 2-host x 1-chip run has local_device_count()==1
        but compiles 2-device SPMD programs, exactly the executables
        that don't round-trip through deserialize_and_load."""
        return jax.device_count() == 1 and jax.process_count() == 1

    def _key(self, name: str, lowered: Any) -> str:
        h = hashlib.sha256()
        h.update(self._fingerprint.encode())
        h.update(name.encode())
        h.update(_normalized_text(lowered).encode())
        return h.hexdigest()[:16]

    def wrap(self, name: str, jitted: Callable) -> _AotEntry:
        return _AotEntry(self, name, jitted)


# Device-committed inputs (e.g. an orbax-restored train state) stamp
# no-op SDY sharding annotations over an "empty mesh" into the lowered
# StableHLO; uncommitted inputs don't. On a single device both lower to
# the same executable, so the KEY ignores these annotations (the program
# text actually compiled is never altered) — otherwise the first resumed
# relaunch re-compiles everything the fresh run already cached.
_EMPTY_MESH_LINE = re.compile(r"^\s*sdy\.mesh @empty_mesh = <\[\]>\n",
                              re.MULTILINE)
_EMPTY_MESH_ATTR = re.compile(
    r" ?\{sdy\.sharding = #sdy\.sharding<@empty_mesh, \[[^\]]*\]>\}")


def _normalized_text(lowered: Any) -> str:
    text = lowered.as_text()
    text = _EMPTY_MESH_LINE.sub("", text)
    return _EMPTY_MESH_ATTR.sub("", text)
