"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process owns 2 virtual CPU devices; together they form a 4-device
global 'data' mesh. Verifies the real multi-host input path:
rank-strided local batches -> shard_batch (make_array_from_process_local_data
branch) -> a jitted global reduction that must see BOTH hosts' data
(collective over the coordination service / gloo).
"""

import os
import sys


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np

    from mb_istft_vits_tpu.parallel import create_mesh, shard_batch

    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.devices()
    assert jax.device_count() == 4, jax.devices()

    mesh = create_mesh()  # all 4 global devices
    # this host's LOCAL shard of the global batch (train.py's rank-strided
    # BucketedBatcher slice): host 0 contributes ones, host 1 twos
    local = {"x": np.full((2, 3), float(pid + 1), np.float32),
             "none": None}
    batch = shard_batch(local, mesh)
    assert batch["x"].shape == (4, 3), batch["x"].shape
    assert batch["none"] is None

    mean = jax.jit(jnp.mean)(batch["x"])
    got = float(jax.device_get(mean))
    # mean over (2 rows of 1.0) + (2 rows of 2.0) — wrong (1.0 or 2.0)
    # if a host only saw its own data
    assert abs(got - 1.5) < 1e-6, got

    # train.py's preemption agreement: SIGTERM lands on ONE host (here:
    # rank 1); the flag allgather must make BOTH hosts decide to
    # checkpoint at the same step (mismatched collective entry would
    # deadlock a real run)
    from jax.experimental import multihost_utils

    local_flag = np.asarray(pid == 1, np.int32)
    flags = multihost_utils.process_allgather(local_flag)
    agreed = bool(np.max(flags))
    assert agreed, (pid, flags)
    print(f"proc {pid}: ok global_mean={got} preempt_agreed={agreed}",
          flush=True)


if __name__ == "__main__":
    main()
