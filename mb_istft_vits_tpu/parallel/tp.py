"""Tensor-parallel parameter sharding over a 2-D (data × model) mesh.

The reference scales only by data parallelism (NCCL DDP,
train_latest.py:113-114); at ~30 M params that is all parity requires.
This module goes beyond parity: it shards the *parameters* themselves
over a second mesh axis so the framework also covers the
memory-constrained regimes (very large batch, long-context variants,
future bigger decoders) where pure DP replication wastes HBM.

Design — XLA-SPMD-native tensor parallelism, not hand-written
collectives:

- Every parameter leaf gets a `NamedSharding` that splits its trailing
  (output-channel / lane) dimension over the ``model`` axis when that
  dimension is divisible by the axis size, falling back to earlier
  dimensions, else replicating.  Trailing-dim ("column-parallel") splits
  keep each layer's output features local to a shard; XLA's SPMD
  partitioner then partitions the matmuls/convolutions and inserts the
  minimal all-gather / reduce-scatter / psum schedule over ICI on its
  own — there is no collective in user code, exactly as the DP gradient
  all-reduce is implicit in `parallel/mesh.py`.
- The batch stays sharded over the ``data`` axis (P("data") on dim 0),
  replicated across ``model``.  Gradients are automatically
  psum'ed over ``data`` and kept sharded over ``model``.
- Optimizer state shards too: `leaf_adamw`
  (train/step.py:make_optimizers) keeps per-leaf param-shaped moments,
  so each mu/nu leaf (the 2× params_size HBM cost of training) takes
  the SAME partition rule as its parameter — moments live next to the
  shard they update, with no resharding in the optimizer.  The legacy
  `flat_adamw` path instead shards its padded flat vectors 1-D over
  ``model``.  Only scalar `count` leaves stay replicated.

Use `create_2d_mesh` + `shard_train_state_tp` + `shard_batch` (which
accepts any mesh with a "data" axis) and the existing
`train/step.py:make_train_step` unchanged — the step is sharding-
agnostic; the input shardings are the whole parallelization contract.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_2d_mesh(
    n_model: int,
    n_data: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Mesh of shape (data, model).

    The model axis is innermost (fastest-varying over the device list)
    so model shards of one data replica land on physically adjacent
    chips — TP traffic (per-layer all-gathers) rides the shortest ICI
    hops while DP traffic (one gradient all-reduce per step) takes the
    longer ones.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        # derived data axis must tile the device set exactly: fail here,
        # not with an opaque zero-device-mesh XLA error far downstream —
        # and never silently idle remainder chips
        n_data = len(devices) // n_model
        if n_data < 1 or n_data * n_model != len(devices):
            raise ValueError(
                f"n_model={n_model} does not tile the {len(devices)} "
                f"available devices; pass n_data explicitly to use a "
                f"subset")
    elif n_data * n_model > len(devices):
        raise ValueError(
            f"data x model = {n_data} x {n_model} needs "
            f"{n_data * n_model} devices, have {len(devices)}")
    # an explicit (n_data, n_model) pair may use a subset deliberately
    devices = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model
    )
    return Mesh(devices, ("data", "model"))


def param_spec(shape, axis_size: int, axis_name: str = "model") -> P:
    """Partition rule for one parameter leaf.

    Shard the trailing dimension (flax convention: Dense/Conv kernels
    are [..., in, out], embeddings [vocab, features] — the output/lane
    dim is last) when divisible by the axis size; otherwise walk
    earlier dimensions; otherwise replicate.  1-D leaves (biases,
    norm scales) replicate — they are negligible and sharding them
    forces XLA to reshard every elementwise add.
    """
    if len(shape) < 2:
        return P()
    for d in range(len(shape) - 1, -1, -1):
        if shape[d] % axis_size == 0 and shape[d] >= axis_size:
            spec = [None] * len(shape)
            spec[d] = axis_name
            return P(*spec)
    return P()


def param_shardings(params: Any, mesh: Mesh,
                    axis_name: str = "model") -> Any:
    """NamedSharding tree for a param pytree under `mesh`."""
    axis_size = mesh.shape[axis_name]
    return jax.tree.map(
        lambda leaf: NamedSharding(
            mesh, param_spec(leaf.shape, axis_size, axis_name)
        ),
        params,
    )


def opt_state_shardings(opt_state: Any, mesh: Mesh,
                        axis_name: str = "model") -> Any:
    """NamedSharding tree for an optimizer state.

    leaf_adamw (the default, train/step.py): per-leaf mu/nu are
    param-shaped, so they take the SAME partition rule as the params —
    moments live next to their parameter shard and the update needs no
    resharding. flat_adamw (legacy): its flat 1-D moment vectors
    (padded to divide any axis <=16) shard over `axis_name`; they are
    recognized by length >= FLAT_PAD_MULTIPLE. Scalar counts and small
    1-D leaves (bias moments) replicate, mirroring param_spec."""
    from mb_istft_vits_tpu.train.step import FLAT_PAD_MULTIPLE

    axis_size = mesh.shape[axis_name]

    def spec(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if (ndim == 1 and leaf.shape[0] >= FLAT_PAD_MULTIPLE
                and leaf.shape[0] % axis_size == 0):
            return NamedSharding(mesh, P(axis_name))
        return NamedSharding(
            mesh, param_spec(getattr(leaf, "shape", ()), axis_size,
                             axis_name)
        )

    return jax.tree.map(spec, opt_state)


def shard_train_state_tp(state: Any, mesh: Mesh,
                         axis_name: str = "model") -> Any:
    """Place a TrainState on a 2-D mesh: params tensor-sharded over
    `axis_name`, flat optimizer moments sharded over `axis_name`,
    step / rng replicated."""
    repl = NamedSharding(mesh, P())
    return state.replace(
        step=jax.device_put(state.step, repl),
        params_g=jax.device_put(
            state.params_g, param_shardings(state.params_g, mesh, axis_name)
        ),
        params_d=jax.device_put(
            state.params_d, param_shardings(state.params_d, mesh, axis_name)
        ),
        opt_state_g=jax.device_put(
            state.opt_state_g,
            opt_state_shardings(state.opt_state_g, mesh, axis_name),
        ),
        opt_state_d=jax.device_put(
            state.opt_state_d,
            opt_state_shardings(state.opt_state_d, mesh, axis_name),
        ),
        rng=jax.device_put(state.rng, repl),
    )
