"""Device mesh + sharding utilities (SPMD data parallelism over ICI)."""

from mb_istft_vits_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
