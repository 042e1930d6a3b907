"""Mel / linear spectrogram front-end.

Behavior contract: reference `mel_processing.py:51-112` — magnitude STFT
with constant padding, Slaney-scale mel filterbank (librosa.filters.mel
defaults: htk=False, norm='slaney'), log dynamic-range compression
log(clamp(x, 1e-5)). The reference caches the mel basis per (dtype, device)
(`mel_processing.py:47-48`); here it's a trace-time numpy constant.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

from mb_istft_vits_tpu.dsp.stft import spectrogram


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sampling_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: Optional[float],
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, n_fft//2+1],
    numerically matching librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)
    as called at reference `mel_processing.py:78,96`."""
    if fmax is None:
        fmax = sampling_rate / 2.0
    n_bins = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sampling_rate / 2.0, n_bins)
    mel_pts = _mel_to_hz(
        np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)),
                    n_mels + 2)
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def spectral_normalize(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """Log dynamic-range compression (reference `mel_processing.py:19-39`)."""
    return jnp.log(jnp.maximum(x, clip_val))


def spec_to_mel(
    spec: jnp.ndarray,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    fmin: float,
    fmax: Optional[float],
) -> jnp.ndarray:
    """Project a linear spectrogram [B, n_bins, F] to log-mel [B, n_mels, F]
    (reference `mel_processing.py:73-82`)."""
    basis = jnp.asarray(
        mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax), spec.dtype
    )
    return spectral_normalize(jnp.einsum("mn,bnf->bmf", basis, spec))


def mel_spectrogram(
    y: jnp.ndarray,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax: Optional[float],
) -> jnp.ndarray:
    """Waveform [B, T] -> log-mel [B, n_mels, F]
    (reference `mel_processing.py:85-112`)."""
    spec = spectrogram(y, n_fft, hop_size, win_size)
    return spec_to_mel(spec, n_fft, num_mels, sampling_rate, fmin, fmax)
