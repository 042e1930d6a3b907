"""Platform pinning that actually works.

On hosts where a TPU platform plugin is pre-registered (e.g. the axon
tunnel runtime), the `JAX_PLATFORMS` environment variable alone does not
stop jax from initializing that backend — and a wedged/unreachable
tunnel then blocks what was meant to be a CPU run forever.
`jax.config.update("jax_platforms", ...)` is authoritative, but must run
before anything touches a backend. Every CLI entry point calls
`apply_env_platform()` first so `JAX_PLATFORMS=cpu python <cli> ...`
behaves the way users of the env var expect (tests/conftest.py applies
the same pattern for the test suite).
"""

from __future__ import annotations

import os


def apply_env_platform() -> None:
    """If JAX_PLATFORMS is set, pin it via jax.config before backend init.

    Also enables the XLA persistent compilation cache (repo-local
    `.jax_cache/cli`, override with MBIV_XLA_CACHE, disable with
    MBIV_XLA_CACHE=0): every CLI/bench/profile entry point then pays
    the multi-minute train-program XLA compile once per code change
    instead of once per process. Runtime measurements are unaffected —
    the cache only short-circuits compilation."""
    import jax

    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        jax.config.update("jax_platforms", platforms)
    cache = os.environ.get("MBIV_XLA_CACHE", "")
    if cache != "0":
        if not cache:
            cache = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), ".jax_cache", "cli")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
