"""Monotonic Alignment Search (MAS), fully on-device.

Behavior contract: reference `monotonic_align/core.pyx:7-42` — Viterbi-style
DP over (frame y, token x) maximizing summed log-likelihood along a
monotonic path with unit x-steps, then a backtrack pass. The reference runs
this in Cython/OpenMP on the host with a device→host→device roundtrip
(`monotonic_align/__init__.py:13-19`); here it is a `lax.scan` wavefront
over rows with a vectorized backtrack (and a Pallas kernel variant in
`mas_pallas.py` for the hot path on TPU).

Inputs follow the reference convention:
    neg_cent: [B, T_y, T_x] log-likelihood (y = spec frames, x = text)
    mask:     [B, T_y, T_x] attention mask (product of x/y masks)
Returns a hard alignment path [B, T_y, T_x] of 0/1 floats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_NEG = -1e9


def _forward_dp(neg_cent: jnp.ndarray, t_ys: jnp.ndarray,
                t_xs: jnp.ndarray) -> jnp.ndarray:
    """Row-wavefront DP. Returns value [B, T_y, T_x] where invalid cells are
    -1e9 (reference core.pyx:15-28; invalid cells there stay untouched but
    are provably never read — masking them keeps the backtrack branch-free).
    """
    b, t_y_max, t_x_max = neg_cent.shape
    xs = jnp.arange(t_x_max)[None, :]  # [1, T_x]

    def row_step(prev, inputs):
        y, nc_row = inputs  # y scalar, nc_row [B, T_x]
        # v_cur: stay at same token (invalid on the diagonal x == y)
        v_cur = jnp.where(xs == y, _MAX_NEG, prev)
        # v_prev: advance from token x-1; at x == 0 only row 0 starts free
        shifted = jnp.pad(prev, ((0, 0), (1, 0)),
                          constant_values=_MAX_NEG)[:, :-1]
        v_prev = shifted.at[:, 0].set(jnp.where(y == 0, 0.0, _MAX_NEG))
        row = nc_row + jnp.maximum(v_prev, v_cur)
        # valid band: max(0, t_x + y - t_y) <= x < min(t_x, y + 1)
        lo = jnp.maximum(0, t_xs[:, None] + y - t_ys[:, None])
        hi = jnp.minimum(t_xs[:, None], y + 1)
        row = jnp.where((xs >= lo) & (xs < hi), row, _MAX_NEG)
        return row, row

    init = jnp.full((b, t_x_max), _MAX_NEG, neg_cent.dtype)
    ys = jnp.arange(t_y_max)
    _, value = jax.lax.scan(
        row_step, init, (ys, jnp.swapaxes(neg_cent, 0, 1))
    )
    return jnp.swapaxes(value, 0, 1)  # [B, T_y, T_x]


def _backtrack(value: jnp.ndarray, t_ys: jnp.ndarray,
               t_xs: jnp.ndarray) -> jnp.ndarray:
    """Greedy backtrack (reference core.pyx:30-33), vectorized over batch.
    Rows are visited from T_y-1 down to 0; rows >= t_y are inactive."""
    b, t_y_max, t_x_max = value.shape
    xs = jnp.arange(t_x_max)[None, :]

    def step(index, y):
        active = y < t_ys  # [B]
        emit = (xs == index[:, None]) & active[:, None]
        # move decision reads row y-1 (clamped; y == 0 is the last emit)
        prev_row = value[:, jnp.maximum(y - 1, 0), :]  # [B, T_x]
        v_here = jnp.take_along_axis(prev_row, index[:, None], axis=1)[:, 0]
        v_left = jnp.take_along_axis(
            prev_row, jnp.maximum(index - 1, 0)[:, None], axis=1
        )[:, 0]
        move = (index != 0) & ((index == y) | (v_here < v_left))
        new_index = jnp.where(active & move, index - 1, index)
        return new_index, emit

    init_index = t_xs - 1
    ys = jnp.arange(t_y_max - 1, -1, -1)
    _, path_rev = jax.lax.scan(step, init_index, ys)
    # path_rev is [T_y, B, T_x] in reversed y order
    path = jnp.flip(jnp.swapaxes(path_rev, 0, 1), axis=1)
    return path


def maximum_path(
    neg_cent: jnp.ndarray, mask: jnp.ndarray, use_pallas: str = "auto"
) -> jnp.ndarray:
    """Drop-in for reference `monotonic_align.maximum_path`
    (`monotonic_align/__init__.py:6-19`). mask: [B, T_y, T_x].

    use_pallas: "auto" (Pallas kernel on TPU, scan elsewhere), True, False.
    """
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from mb_istft_vits_tpu.ops.mas_pallas import maximum_path_pallas

        return maximum_path_pallas(neg_cent, mask)
    dtype = neg_cent.dtype
    neg_cent32 = neg_cent.astype(jnp.float32) * mask
    t_ys = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)
    t_xs = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)
    value = _forward_dp(neg_cent32, t_ys, t_xs)
    path = _backtrack(value, t_ys, t_xs)
    return path.astype(dtype)


def maximum_path_numpy(neg_cent, mask):
    """Pure-numpy oracle transcribing the reference DP exactly
    (core.pyx:7-33), for tests only."""
    import numpy as np

    neg_cent = np.array(neg_cent, dtype=np.float32) * np.array(mask)
    b, t_y_max, t_x_max = neg_cent.shape
    t_ys = mask.sum(axis=1)[:, 0].astype(int)
    t_xs = mask.sum(axis=2)[:, 0].astype(int)
    paths = np.zeros_like(neg_cent, dtype=np.int32)
    for i in range(b):
        value = neg_cent[i].copy()
        t_y, t_x = int(t_ys[i]), int(t_xs[i])
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = -1e9 if x == y else value[y - 1, x]
                if x == 0:
                    v_prev = 0.0 if y == 0 else -1e9
                else:
                    v_prev = value[y - 1, x - 1]
                value[y, x] += max(v_prev, v_cur)
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[i, y, index] = 1
            if index != 0 and (
                index == y or value[y - 1, index] < value[y - 1, index - 1]
            ):
                index -= 1
    return paths.astype(np.float32)
