"""Segment slicing and duration→alignment path expansion.

Behavior contract: reference `commons.py:48-64,121-143`. Channel-last
layout: sequence tensors are [B, T, C].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """[B] -> [B, T] bool (reference commons.py:121-125)."""
    pos = jnp.arange(max_length)[None, :]
    return pos < lengths[:, None]


def slice_segments(x: jnp.ndarray, ids_str: jnp.ndarray,
                   segment_size: int) -> jnp.ndarray:
    """Per-sample windowed slice: x [B, T, C], ids_str [B] ->
    [B, segment_size, C] (reference commons.py:48-54)."""

    def one(xi, idx):
        return jax.lax.dynamic_slice_in_dim(xi, idx, segment_size, axis=0)

    return jax.vmap(one)(x, ids_str)


def rand_slice_segments(
    x: jnp.ndarray,
    rng: jax.Array,
    x_lengths: Optional[jnp.ndarray] = None,
    segment_size: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random windowed slice for the vocoder tail
    (reference commons.py:57-64). Returns (segments, start ids)."""
    b, t, _ = x.shape
    if x_lengths is None:
        x_lengths = jnp.full((b,), t)
    ids_str_max = jnp.maximum(x_lengths - segment_size + 1, 1)
    u = jax.random.uniform(rng, (b,))
    ids_str = (u * ids_str_max).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str


def get_timing_signal_1d(
    length: int,
    channels: int,
    min_timescale: float = 1.0,
    max_timescale: float = 1.0e4,
) -> jnp.ndarray:
    """Transformer sinusoid position signal [1, length, channels]
    (reference commons.py:67-82; channel-last here)."""
    position = jnp.arange(length, dtype=jnp.float32)
    num_timescales = channels // 2
    log_timescale_increment = (
        jnp.log(jnp.asarray(max_timescale / min_timescale))
        / max(num_timescales - 1, 1)
    )
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32)
        * -log_timescale_increment
    )
    scaled_time = position[:, None] * inv_timescales[None, :]  # [T, C/2]
    signal = jnp.concatenate(
        [jnp.sin(scaled_time), jnp.cos(scaled_time)], axis=1
    )
    signal = jnp.pad(signal, ((0, 0), (0, channels % 2)))
    return signal[None]  # [1, T, C]


def add_timing_signal_1d(x: jnp.ndarray, min_timescale: float = 1.0,
                         max_timescale: float = 1.0e4) -> jnp.ndarray:
    """x [B, T, C] + sinusoid signal (reference commons.py:85-88)."""
    _, t, c = x.shape
    return x + get_timing_signal_1d(t, c, min_timescale,
                                    max_timescale).astype(x.dtype)


def cat_timing_signal_1d(x: jnp.ndarray, min_timescale: float = 1.0,
                         max_timescale: float = 1.0e4,
                         axis: int = -1) -> jnp.ndarray:
    """Concatenate the sinusoid signal on the channel axis
    (reference commons.py:91-94; axis=-1 is the channel in our layout)."""
    b, t, c = x.shape
    signal = get_timing_signal_1d(t, c, min_timescale,
                                  max_timescale).astype(x.dtype)
    return jnp.concatenate([x, jnp.broadcast_to(signal, (b, t, c))],
                           axis=axis)


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Expand durations into a hard monotonic alignment
    (reference commons.py:128-143).

    duration: [B, T_x] (integer-valued floats)
    mask:     [B, T_y, T_x]
    returns:  [B, T_y, T_x] 0/1 path
    """
    b, t_y, t_x = mask.shape
    cum = jnp.cumsum(duration, axis=-1)  # [B, T_x]
    # path[b, x, y] = y < cum[b, x]
    steps = jnp.arange(t_y)[None, None, :]
    path = (steps < cum[:, :, None]).astype(mask.dtype)  # [B, T_x, T_y]
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return jnp.swapaxes(path, 1, 2) * mask
