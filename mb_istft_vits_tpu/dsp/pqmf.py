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


class PQMFBank:
    """PQMF analysis/synthesis over [B, T, C] signals.

    analysis:  [B, T, 1] -> [B, T // subbands, subbands]
    synthesis: [B, T // subbands, subbands] -> [B, T, 1]
    """

    def __init__(self, subbands: int = 4, taps: int = 62,
                 cutoff_ratio: float = 0.15, beta: float = 9.0):
        self.subbands = subbands
        self.taps = taps
        h_a, h_s = _pqmf_filters(subbands, taps, cutoff_ratio, beta)
        # rhs layout HIO for lax conv: [width, in_ch, out_ch]
        self.analysis_filter = h_a.T[:, None, :]       # [taps+1, 1, subbands]
        self.synthesis_filter = h_s.T[:, :, None]      # [taps+1, subbands, 1]

    def _conv(self, x: jnp.ndarray, w: np.ndarray) -> jnp.ndarray:
        return jax.lax.conv_general_dilated(
            x,
            jnp.asarray(w, x.dtype),
            window_strides=(1,),
            padding=((self.taps // 2, self.taps // 2),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """Split [B, T, 1] into subbands (reference `pqmf.py:95-103`).
        Downsampling by stride-s selection replaces the reference's
        identity-conv downsampler."""
        y = self._conv(x, self.analysis_filter)        # [B, T, subbands]
        return y[:, :: self.subbands, :]

    def synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        """Recombine subbands [B, T/s, s] -> [B, T, 1]
        (reference `pqmf.py:105-116`). Zero-stuffing ×s with gain s replaces
        the reference's identity conv_transpose upsampler."""
        b, t, s = x.shape
        up = jnp.zeros((b, t, s, s), x.dtype)
        up = up.at[:, :, 0, :].set(x * s)
        up = up.reshape(b, t * s, s)
        return self._conv(up, self.synthesis_filter)
