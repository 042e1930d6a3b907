"""Objective audio metrics.

Mel-cepstral distortion (MCD) is the repo's fidelity north-star
(BASELINE.md: MCD < 0.5 dB vs the PyTorch reference); the reference itself
ships no metric code (SURVEY.md §4), so this fills that gap.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II rows [n_out, n_in] (scipy.fftpack.dct norm='ortho')."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    m = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    m[0] *= np.sqrt(1.0 / n_in)
    m[1:] *= np.sqrt(2.0 / n_in)
    return m


def mel_cepstra(
    wav: np.ndarray,
    sampling_rate: int,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    n_cep: int = 13,
) -> np.ndarray:
    """Mel cepstra [frames, n_cep] (c0 included) from a mono waveform."""
    import jax.numpy as jnp

    from mb_istft_vits_tpu.dsp.mel import mel_spectrogram

    mel = np.asarray(
        mel_spectrogram(
            jnp.asarray(wav[None].astype(np.float32)), n_fft, n_mels,
            sampling_rate, hop_length, win_length, 0.0, None,
        )[0]
    )  # [n_mels, F]; already log-compressed (reference mel dynamic range)
    return (_dct_matrix(n_cep, n_mels) @ mel).T  # [F, n_cep]


def mel_cepstral_distortion(
    wav_a: np.ndarray,
    wav_b: np.ndarray,
    sampling_rate: int,
    n_cep: int = 13,
    exclude_c0: bool = True,
    **kwargs,
) -> float:
    """Frame-averaged MCD in dB between two same-rate waveforms.

    MCD = (10 / ln 10) * sqrt(2 * sum_d (c_d - c'_d)^2), mean over frames,
    d >= 1 by convention (c0 is overall energy). Waveforms are truncated to
    the shorter length (the intended use compares two decodes of the same
    latents, which are already aligned)."""
    n = min(len(wav_a), len(wav_b))
    ca = mel_cepstra(wav_a[:n], sampling_rate, n_cep=n_cep, **kwargs)
    cb = mel_cepstra(wav_b[:n], sampling_rate, n_cep=n_cep, **kwargs)
    start = 1 if exclude_c0 else 0
    diff = ca[:, start:] - cb[:, start:]
    per_frame = np.sqrt(2.0 * np.sum(diff**2, axis=1))
    return float((10.0 / np.log(10.0)) * np.mean(per_frame))
