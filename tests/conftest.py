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
# 0.0: persist EVERY compile, including the hundreds of sub-second
# per-primitive CPU compiles that eager `model.init`/`apply` go through.
# Those are the real cost of the fast loop (measured: eager init of the
# tiny mb_istft model is ~109 s cold and ~18 s with them persisted; the
# handful of big jitted programs were already cached at the 1.0 s
# threshold). Disk cost is a few thousand small files under .jax_cache,
# bounded by JAX's LRU eviction below (entries from old JAX/config/model
# versions age out instead of accumulating forever).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_compilation_cache_max_size", 512 * 1024 * 1024)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
