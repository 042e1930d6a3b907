"""Device mesh + sharding utilities (SPMD data/tensor parallelism over ICI)."""

from mb_istft_vits_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from mb_istft_vits_tpu.parallel.tp import (  # noqa: F401
    create_2d_mesh,
    opt_state_shardings,
    param_shardings,
    param_spec,
    shard_train_state_tp,
)
