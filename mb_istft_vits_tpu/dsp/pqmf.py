"""Pseudo-QMF analysis/synthesis filterbank.

Behavior contract: reference `pqmf.py:15-116` — Kaiser-window prototype
filter, cosine-modulated 4-band analysis/synthesis filters, stride-k
down/up-sampling. The reference constructs filters with `.cuda(device)`
(CUDA-only, `pqmf.py:78-88`); here filter design is trace-time numpy and the
filters are XLA constants, so the bank is device-agnostic and jit-friendly.

Layout: waveforms are channels-last [B, T, C].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def design_prototype_filter(
    taps: int = 62, cutoff_ratio: float = 0.15, beta: float = 9.0
) -> np.ndarray:
    """Kaiser-window lowpass prototype (reference `pqmf.py:15-43`)."""
    assert taps % 2 == 0, "The number of taps must be even."
    assert 0.0 < cutoff_ratio < 1.0
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio  # sinc(0) limit
    return h_i * np.kaiser(taps + 1, beta)


@functools.lru_cache(maxsize=None)
def _pqmf_filters(
    subbands: int, taps: int, cutoff_ratio: float, beta: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Cosine-modulated analysis/synthesis filters, each [subbands, taps+1]
    (reference `pqmf.py:64-75`)."""
    h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
    n = np.arange(taps + 1)
    h_analysis = np.zeros((subbands, taps + 1))
    h_synthesis = np.zeros((subbands, taps + 1))
    for k in range(subbands):
        mod = (2 * k + 1) * (np.pi / (2 * subbands)) * (n - (taps - 1) / 2)
        h_analysis[k] = 2 * h_proto * np.cos(mod + (-1) ** k * np.pi / 4)
        h_synthesis[k] = 2 * h_proto * np.cos(mod - (-1) ** k * np.pi / 4)
    return h_analysis.astype(np.float32), h_synthesis.astype(np.float32)


def _synthesis_ctx_pad(subbands: int, taps: int) -> int:
    """Band-rate context radius a synthesis output block needs: the 63-tap
    full-rate filter reaches floor((taps//2 + s - 1)/s) band samples each
    way; rounded up so the framing slice widths stay lane-aligned."""
    return -(-(taps // 2 + subbands - 1) // subbands)


@functools.lru_cache(maxsize=None)
def _polyphase_synthesis_basis(
    subbands: int, taps: int, cutoff_ratio: float, beta: float, group: int
) -> np.ndarray:
    """[(group + 2*C)*s, group*s] basis for polyphase PQMF synthesis.

    Row (i*s + b) is band-b input at band-rate context position i (block
    start minus C); column (j*s + p) is full-rate output sample j*s+p of
    the block. Entry = s * h_s[b, k] with k the correlation tap offset —
    exactly the zero-stuff(×s, gain s) + 63-tap conv pipeline
    (reference `pqmf.py:105-116`), folded into one dense matmul.
    """
    s = subbands
    half = taps // 2
    c = _synthesis_ctx_pad(s, taps)
    _, h_s = _pqmf_filters(s, taps, cutoff_ratio, beta)
    basis = np.zeros(((group + 2 * c) * s, group * s), np.float32)
    for i in range(group + 2 * c):
        m_rel = i - c  # band-rate sample index relative to block start
        for j in range(group):
            k = (m_rel - j) * s + half
            for p in range(s):
                kk = k - p
                if 0 <= kk <= taps:
                    basis[i * s : (i + 1) * s, j * s + p] = (
                        s * h_s[:, kk]
                    )
    return basis


@functools.lru_cache(maxsize=None)
def _polyphase_analysis_basis(
    subbands: int, taps: int, cutoff_ratio: float, beta: float, group: int
) -> np.ndarray:
    """[group*s + 2*Cx, group*s] basis for polyphase PQMF analysis.

    Row c is the full-rate input at context position c (block start minus
    Cx = s*ceil(half/s)); column (j*s + b) is band-b output sample j of the
    block: entry = h_a[b, c - j*s + half - Cx] — the 63-tap conv +
    stride-s selection (reference `pqmf.py:95-103`) as one matmul.
    """
    s = subbands
    half = taps // 2
    cx = s * (-(-half // s))
    h_a, _ = _pqmf_filters(s, taps, cutoff_ratio, beta)
    basis = np.zeros((group * s + 2 * cx, group * s), np.float32)
    for c in range(group * s + 2 * cx):
        for j in range(group):
            k = c - j * s + half - cx
            if 0 <= k <= taps:
                basis[c, j * s : (j + 1) * s] = h_a[:, k]
    return basis


def _framed_blocks(
    x_flat: jnp.ndarray, nblk: int, block: int, extra: int
) -> jnp.ndarray:
    """[B, (nblk+1)*block] -> [B, nblk, block+extra] overlapping views via
    two static slices (extra <= block)."""
    b = x_flat.shape[0]
    v = x_flat.reshape(b, nblk + 1, block)
    return jnp.concatenate([v[:, :nblk], v[:, 1:, :extra]], axis=2)


@functools.lru_cache(maxsize=None)
def _synthesis_basis_bm(subbands: int, taps: int, cutoff_ratio: float,
                        beta: float, group: int) -> np.ndarray:
    """Row-permuted synthesis basis for band-major input: row
    (b*(group+2c) + i) instead of (i*s + b), so the context blocks can
    be framed per band from a [B, S, T/S] layout with no 4-lane
    transpose."""
    s = subbands
    c = _synthesis_ctx_pad(s, taps)
    basis = _polyphase_synthesis_basis(s, taps, cutoff_ratio, beta, group)
    return np.ascontiguousarray(
        basis.reshape(group + 2 * c, s, group * s)
        .transpose(1, 0, 2)
        .reshape((group + 2 * c) * s, group * s)
    )


@functools.lru_cache(maxsize=None)
def _analysis_basis_bm(subbands: int, taps: int, cutoff_ratio: float,
                       beta: float, group: int) -> np.ndarray:
    """Column-permuted analysis basis: column (b*group + j) instead of
    (j*s + b), so a block's output is band-major and the final layout
    fix is a cheap 128-lane-contiguous block transpose."""
    s = subbands
    basis = _polyphase_analysis_basis(s, taps, cutoff_ratio, beta, group)
    rows = basis.shape[0]
    return np.ascontiguousarray(
        basis.reshape(rows, group, s).transpose(0, 2, 1).reshape(rows, -1)
    )


class PQMFBank:
    """PQMF analysis/synthesis over [B, T, C] signals.

    analysis:  [B, T, 1] -> [B, ceil(T / subbands), subbands]
    synthesis: [B, T/s, s] -> [B, T, 1]
    analysis_bm / synthesis_bm: band-major [B, S, T/S] variants — the
    training-loss path (train/step.py) and the MB decoder head use
    these so no [*, *, subbands] 4-lane (4/128 lane utilization)
    elementwise/transpose ops appear anywhere in the G step
    (VERDICT.md r2 weak #1b).

    Both directions are polyphase group matmuls: the reference's conv
    pipeline has C_in=1 (analysis) / C_out=1 (synthesis) — 1/128 lane
    utilization on TPU, in the backward pass too. Grouping `group`
    band-rate samples per block turns each into a
    [B, nblk, ctx] @ [ctx, group*s] matmul with ~512 lanes.
    """

    group: int = 128

    def __init__(self, subbands: int = 4, taps: int = 62,
                 cutoff_ratio: float = 0.15, beta: float = 9.0):
        self.subbands = subbands
        self.taps = taps
        self.cutoff_ratio = cutoff_ratio
        self.beta = beta
        h_a, h_s = _pqmf_filters(subbands, taps, cutoff_ratio, beta)
        # kept for introspection/tests; compute path is the basis matmul
        self.analysis_filter = h_a.T[:, None, :]       # [taps+1, 1, subbands]
        self.synthesis_filter = h_s.T[:, :, None]      # [taps+1, subbands, 1]

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """Split [B, T, 1] into subbands (reference `pqmf.py:95-103`)."""
        b, t, _ = x.shape
        s, g = self.subbands, self.group
        cx = s * (-(-(self.taps // 2) // s))
        t_out = -(-t // s)
        nblk = -(-t_out // g)
        block = g * s
        pad_r = (nblk + 1) * block - cx - t
        x_flat = jnp.pad(x[..., 0], ((0, 0), (cx, pad_r)))
        ctx = _framed_blocks(x_flat, nblk, block, 2 * cx)
        basis = _polyphase_analysis_basis(
            s, self.taps, self.cutoff_ratio, self.beta, g)
        out = jnp.matmul(ctx, jnp.asarray(basis, x.dtype),
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(b, nblk * g, s)[:, :t_out]

    def analysis_bm(self, x: jnp.ndarray) -> jnp.ndarray:
        """Band-major analysis: [B, T, 1] -> [B, S, ceil(T/S)]."""
        b, t, _ = x.shape
        s, g = self.subbands, self.group
        cx = s * (-(-(self.taps // 2) // s))
        t_out = -(-t // s)
        nblk = -(-t_out // g)
        block = g * s
        pad_r = (nblk + 1) * block - cx - t
        x_flat = jnp.pad(x[..., 0], ((0, 0), (cx, pad_r)))
        ctx = _framed_blocks(x_flat, nblk, block, 2 * cx)
        basis = _analysis_basis_bm(
            s, self.taps, self.cutoff_ratio, self.beta, g)
        out = jnp.matmul(ctx, jnp.asarray(basis, x.dtype),
                         precision=jax.lax.Precision.HIGHEST)
        # [B, nblk, s, g] -> [B, s, nblk, g]: last dim g=128 contiguous,
        # a cheap sublane shuffle rather than a 4-lane transpose
        out = out.reshape(b, nblk, s, g).transpose(0, 2, 1, 3)
        return out.reshape(b, s, nblk * g)[:, :, :t_out]

    def synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        """Recombine subbands [B, T/s, s] -> [B, T, 1]
        (reference `pqmf.py:105-116`)."""
        b, t, s = x.shape
        g = self.group
        c = _synthesis_ctx_pad(s, self.taps)
        nblk = -(-t // g)
        pad_r = (nblk + 1) * g - c - t
        x_flat = jnp.pad(x, ((0, 0), (c, pad_r), (0, 0))).reshape(b, -1)
        ctx = _framed_blocks(x_flat, nblk, g * s, 2 * c * s)
        basis = _polyphase_synthesis_basis(
            s, self.taps, self.cutoff_ratio, self.beta, g)
        out = jnp.matmul(ctx, jnp.asarray(basis, x.dtype),
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(b, nblk * g * s)[:, : t * s, None]

    def synthesis_bm(self, x: jnp.ndarray) -> jnp.ndarray:
        """Band-major synthesis: [B, S, T/S] -> [B, T, 1]."""
        b, s, t = x.shape
        g = self.group
        c = _synthesis_ctx_pad(s, self.taps)
        nblk = -(-t // g)
        pad_r = (nblk + 1) * g - c - t
        x_flat = jnp.pad(x, ((0, 0), (0, 0), (c, pad_r)))
        ctx = _framed_blocks(x_flat.reshape(b * s, -1), nblk, g, 2 * c)
        # [B*s, nblk, g+2c] -> [B, nblk, s*(g+2c)] (block transpose over
        # a (g+2c)~136-contiguous last dim)
        ctx = ctx.reshape(b, s, nblk, g + 2 * c).transpose(0, 2, 1, 3)
        ctx = ctx.reshape(b, nblk, s * (g + 2 * c))
        basis = _synthesis_basis_bm(
            s, self.taps, self.cutoff_ratio, self.beta, g)
        out = jnp.matmul(ctx, jnp.asarray(basis, x.dtype),
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(b, nblk * g * s)[:, : t * s, None]
