"""Pallas TPU kernel for Monotonic Alignment Search.

Replaces the reference's host Cython DP (`monotonic_align/core.pyx:7-42`)
with an on-chip two-pass wavefront:

  pass 1 (forward): grid over frame rows y; each step updates the DP row
    for ALL batch items at once ([B, T_x] on the VPU, T_x on lanes) and
    emits one *decision bit* per cell — whether the max chose the diagonal
    predecessor. Only the bits leave VMEM; the value matrix itself lives in
    a single rolling [B, T_x] scratch row (4× less HBM traffic than
    materializing values like the lax.scan variant).

  pass 2 (backtrack): grid over rows in reverse; the path cursor is a
    ONE-HOT [B, T_x] vector in VMEM scratch, so emit/move/shift are pure
    elementwise VPU ops with no gathers:
      emit  = onehot · active
      move  = (decision bit at cursor) · (cursor not at x=0) · active
      shift = roll(onehot, -1) where move

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

    # advance-from-previous-token candidate (shift right along lanes)
    shifted = pltpu.roll(prev, 1, axis=1)
    first_col = jnp.where(y == 0, 0.0, _MAX_NEG)
    shifted = jnp.where(xs == 0, first_col, shifted)
    # stay-on-token candidate (invalid on the diagonal x == y)
    v_cur = jnp.where(xs == y, _MAX_NEG, prev)

    # decision bit: 1 -> backtrack moves to x-1 (reference core.pyx:32)
    dec = (xs == y) | (v_cur < shifted)
    dec_ref[0] = dec.astype(jnp.float32)

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

    dec = dec_ref[0]
    d_at = jnp.sum(onehot * dec, axis=1, keepdims=True)
    at_zero = jnp.sum(onehot * (xs == 0), axis=1, keepdims=True)
    move = (d_at > 0) & (at_zero == 0) & (active > 0)
    rolled = pltpu.roll(onehot, t_x_max - 1, axis=1)  # == roll by -1
    onehot_ref[:] = jnp.where(move, rolled, onehot)


@functools.partial(jax.jit, static_argnames=())
def maximum_path_pallas(neg_cent: jnp.ndarray,
                        mask: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ops.mas.maximum_path, Pallas TPU implementation.

    neg_cent, mask: [B, T_y, T_x]; returns 0/1 path of the same shape.
    """
    dtype = neg_cent.dtype
    b, t_y_max, t_x_max = neg_cent.shape
    nc = (neg_cent.astype(jnp.float32) * mask).transpose(1, 0, 2)
    t_ys = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)[:, None]  # [B,1]
    t_xs = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)[:, None]

    row_spec = pl.BlockSpec((1, b, t_x_max), lambda y: (y, 0, 0),
                            memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    dec = pl.pallas_call(
        _fwd_kernel,
        grid=(t_y_max,),
        in_specs=[len_spec, len_spec, row_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((t_y_max, b, t_x_max), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, t_x_max), jnp.float32)],
    )(t_ys, t_xs, nc)

    rev_spec = pl.BlockSpec(
        (1, b, t_x_max), lambda i: (t_y_max - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    path = pl.pallas_call(
        _bwd_kernel,
        grid=(t_y_max,),
        in_specs=[len_spec, len_spec, rev_spec],
        out_specs=rev_spec,
        out_shape=jax.ShapeDtypeStruct((t_y_max, b, t_x_max), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, t_x_max), jnp.float32)],
    )(t_ys, t_xs, dec)

    return path.transpose(1, 0, 2).astype(dtype)
