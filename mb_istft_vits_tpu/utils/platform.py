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
    """If JAX_PLATFORMS is set, pin it via jax.config before backend init."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)
