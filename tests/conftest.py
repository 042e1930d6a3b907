"""Test config: force CPU with 8 virtual devices so multi-chip sharding
logic is testable without a TPU pod (SURVEY.md §4).

Note: the axon harness pins JAX_PLATFORMS, so we must use jax.config.update
(env var alone is ignored).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite's cost is XLA compiles (the two
# tiny GAN train programs alone are ~100 s each on one CPU); repeat runs
# deserialize instead of recompiling
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache",
                          "tests")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
