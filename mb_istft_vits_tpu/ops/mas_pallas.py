"""Pallas TPU kernels for Monotonic Alignment Search.

Replaces the reference's host Cython DP (`monotonic_align/core.pyx:7-42`)
with an on-chip wavefront. Two implementations, dispatched by VMEM fit:

FUSED (v2, the default for training shapes): ONE kernel, grid of
2*ceil(T_y/K) macro-steps of K=8 rows each.
  - forward phase: each macro-step updates the DP row for ALL batch items
    at once ([B, T_x] on the VPU, T_x on lanes) K times, writing one
    *decision byte* per cell into an int8 VMEM scratch — decisions never
    touch HBM.
  - backward phase (same kernel, second half of the grid): the path cursor
    is a ONE-HOT [B, T_x] vector in VMEM scratch, so emit/move/shift are
    pure elementwise VPU ops with no gathers:
      emit  = onehot * active
      move  = (decision at cursor) * (cursor not at x=0) * active
      shift = roll(onehot, -1) where move
  HBM traffic is exactly one read of neg_cent + one write of the path
  (8 B/cell vs 16 for the two-pass version), and K-row macro-steps
  amortize the per-grid-step overhead that dominates this
  latency-bound DP (the math is 2 VPU ops/cell; bandwidth is nowhere
  near the limit — grid sequencing is).

TWO-PASS (v1 fallback): when the [T_y, B, T_x] int8 decision tensor
exceeds the VMEM budget (very long specs), decisions spill to HBM
between a forward and a backward pallas_call.

Semantics are bit-identical to `ops.mas.maximum_path` (tested against the
numpy transcription of the reference DP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_NEG = -1e9
_ROWS_PER_STEP = 8
# decision scratch budget: leave room for the nc/path blocks + row scratch
_FUSED_VMEM_BUDGET = 8 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# fused single-kernel implementation
# ---------------------------------------------------------------------------


def _fused_kernel(n_fwd: int, k: int, t_ys_ref, t_xs_ref, nc_ref, path_ref,
                  dec_ref, prev_ref, onehot_ref):
    i = pl.program_id(0)
    b, t_x_max = prev_ref.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, t_x_max), 1)
    t_ys = t_ys_ref[:]  # [B, 1]
    t_xs = t_xs_ref[:]

    @pl.when(i < n_fwd)
    def _forward():
        @pl.when(i == 0)
        def _():
            prev_ref[:] = jnp.full((b, t_x_max), _MAX_NEG, jnp.float32)

        for jj in range(k):
            y = i * k + jj
            prev = prev_ref[:]
            # advance-from-previous-token candidate (shift right on lanes)
            shifted = pltpu.roll(prev, 1, axis=1)
            first_col = jnp.where(y == 0, 0.0, _MAX_NEG)
            shifted = jnp.where(xs == 0, first_col, shifted)
            # stay-on-token candidate (invalid on the diagonal x == y)
            v_cur = jnp.where(xs == y, _MAX_NEG, prev)
            # decision: 1 -> backtrack moves to x-1 (reference core.pyx:32)
            dec = (xs == y) | (v_cur < shifted)
            dec_ref[pl.ds(y, 1)] = dec.astype(jnp.int8)[None]
            row = nc_ref[jj] + jnp.maximum(shifted, v_cur)
            lo = jnp.maximum(0, t_xs + y - t_ys)
            hi = jnp.minimum(t_xs, y + 1)
            prev_ref[:] = jnp.where((xs >= lo) & (xs < hi), row, _MAX_NEG)

    @pl.when(i >= n_fwd)
    def _backward():
        @pl.when(i == n_fwd)
        def _():
            onehot_ref[:] = (xs == t_xs - 1).astype(jnp.float32)

        blk = 2 * n_fwd - 1 - i  # output block written this step
        for jj in range(k):
            lr = k - 1 - jj  # walk the block's rows top-down
            y = blk * k + lr
            onehot = onehot_ref[:]
            active = (y < t_ys).astype(jnp.float32)
            path_ref[lr] = onehot * active
            dec = dec_ref[pl.ds(y, 1)][0].astype(jnp.float32)
            d_at = jnp.sum(onehot * dec, axis=1, keepdims=True)
            at_zero = jnp.sum(onehot * (xs == 0), axis=1, keepdims=True)
            move = (d_at > 0) & (at_zero == 0) & (active > 0)
            rolled = pltpu.roll(onehot, t_x_max - 1, axis=1)  # roll by -1
            onehot_ref[:] = jnp.where(move, rolled, onehot)


def _maximum_path_fused(nc, t_ys, t_xs, t_y_max: int, t_x_max: int, b: int):
    k = _ROWS_PER_STEP
    t_y_pad = _round_up(t_y_max, k)
    if t_y_pad != t_y_max:
        nc = jnp.pad(nc, ((0, t_y_pad - t_y_max), (0, 0), (0, 0)))
    g = t_y_pad // k

    len_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    nc_spec = pl.BlockSpec((k, b, t_x_max),
                           lambda i: (jnp.minimum(i, g - 1), 0, 0),
                           memory_space=pltpu.VMEM)
    # constant block index through the forward phase and the first backward
    # step: nothing is flushed until the first backward step has fully
    # written the top block
    path_spec = pl.BlockSpec(
        (k, b, t_x_max),
        lambda i: (jnp.where(i < g, g - 1, 2 * g - 1 - i), 0, 0),
        memory_space=pltpu.VMEM,
    )
    path = pl.pallas_call(
        functools.partial(_fused_kernel, g, k),
        grid=(2 * g,),
        in_specs=[len_spec, len_spec, nc_spec],
        out_specs=path_spec,
        out_shape=jax.ShapeDtypeStruct((t_y_pad, b, t_x_max), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_y_pad, b, t_x_max), jnp.int8),
            pltpu.VMEM((b, t_x_max), jnp.float32),
            pltpu.VMEM((b, t_x_max), jnp.float32),
        ],
    )(t_ys, t_xs, nc)
    return path[:t_y_max]


# ---------------------------------------------------------------------------
# two-pass fallback (decision tensor spills to HBM)
# ---------------------------------------------------------------------------


def _fwd_kernel(t_ys_ref, t_xs_ref, nc_ref, dec_ref, prev_ref):
    y = pl.program_id(0)
    b, t_x_max = prev_ref.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, t_x_max), 1)

    @pl.when(y == 0)
    def _():
        prev_ref[:] = jnp.full((b, t_x_max), _MAX_NEG, jnp.float32)

    prev = prev_ref[:]
    t_ys = t_ys_ref[:]  # [B, 1]
    t_xs = t_xs_ref[:]

    shifted = pltpu.roll(prev, 1, axis=1)
    first_col = jnp.where(y == 0, 0.0, _MAX_NEG)
    shifted = jnp.where(xs == 0, first_col, shifted)
    v_cur = jnp.where(xs == y, _MAX_NEG, prev)

    dec = (xs == y) | (v_cur < shifted)
    dec_ref[0] = dec.astype(jnp.int8)

    row = nc_ref[0] + jnp.maximum(shifted, v_cur)
    lo = jnp.maximum(0, t_xs + y - t_ys)
    hi = jnp.minimum(t_xs, y + 1)
    row = jnp.where((xs >= lo) & (xs < hi), row, _MAX_NEG)
    prev_ref[:] = row


def _bwd_kernel(t_ys_ref, t_xs_ref, dec_ref, path_ref, onehot_ref):
    i = pl.program_id(0)
    t_y_max = pl.num_programs(0)
    y = t_y_max - 1 - i
    b, t_x_max = onehot_ref.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, t_x_max), 1)
    t_ys = t_ys_ref[:]  # [B, 1]
    t_xs = t_xs_ref[:]

    @pl.when(i == 0)
    def _():
        onehot_ref[:] = (xs == t_xs - 1).astype(jnp.float32)

    onehot = onehot_ref[:]
    active = (y < t_ys).astype(jnp.float32)
    path_ref[0] = onehot * active

    dec = dec_ref[0].astype(jnp.float32)
    d_at = jnp.sum(onehot * dec, axis=1, keepdims=True)
    at_zero = jnp.sum(onehot * (xs == 0), axis=1, keepdims=True)
    move = (d_at > 0) & (at_zero == 0) & (active > 0)
    rolled = pltpu.roll(onehot, t_x_max - 1, axis=1)  # == roll by -1
    onehot_ref[:] = jnp.where(move, rolled, onehot)


def _maximum_path_two_pass(nc, t_ys, t_xs, t_y_max: int, t_x_max: int,
                           b: int):
    row_spec = pl.BlockSpec((1, b, t_x_max), lambda y: (y, 0, 0),
                            memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    dec = pl.pallas_call(
        _fwd_kernel,
        grid=(t_y_max,),
        in_specs=[len_spec, len_spec, row_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((t_y_max, b, t_x_max), jnp.int8),
        scratch_shapes=[pltpu.VMEM((b, t_x_max), jnp.float32)],
    )(t_ys, t_xs, nc)

    rev_spec = pl.BlockSpec(
        (1, b, t_x_max), lambda i: (t_y_max - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid=(t_y_max,),
        in_specs=[len_spec, len_spec, rev_spec],
        out_specs=rev_spec,
        out_shape=jax.ShapeDtypeStruct((t_y_max, b, t_x_max), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, t_x_max), jnp.float32)],
    )(t_ys, t_xs, dec)


@functools.partial(jax.jit, static_argnames=("force",))
def maximum_path_pallas(neg_cent: jnp.ndarray, mask: jnp.ndarray,
                        force: str = "auto") -> jnp.ndarray:
    """Drop-in for ops.mas.maximum_path, Pallas TPU implementation.

    neg_cent, mask: [B, T_y, T_x]; returns 0/1 path of the same shape.
    force: "auto" picks fused vs two-pass by VMEM fit; "fused"/"two_pass"
    pin an implementation (benchmarks, tests).
    """
    dtype = neg_cent.dtype
    b, t_y_max, t_x_max = neg_cent.shape
    nc = (neg_cent.astype(jnp.float32) * mask).transpose(1, 0, 2)
    t_ys = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)[:, None]  # [B,1]
    t_xs = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)[:, None]

    if force == "auto":
        # int8 decision scratch, lanes padded to the 128 tile
        dec_bytes = (_round_up(t_y_max, _ROWS_PER_STEP)
                     * _round_up(b, 32) * _round_up(t_x_max, 128))
        force = "fused" if dec_bytes <= _FUSED_VMEM_BUDGET else "two_pass"
    if force == "fused":
        path = _maximum_path_fused(nc, t_ys, t_xs, t_y_max, t_x_max, b)
    else:
        path = _maximum_path_two_pass(nc, t_ys, t_xs, t_y_max, t_x_max, b)
    return path.transpose(1, 0, 2).astype(dtype)
