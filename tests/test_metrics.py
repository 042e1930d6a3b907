"""Objective metric suite (utils/metrics.py): YIN F0, pitch metrics, LSD.

(MCD itself is pinned against the torch reference in
tests/test_torch_import.py; these cover the rest of the eval metrics.)
"""

import numpy as np

from mb_istft_vits_tpu.utils.metrics import (
    f0_metrics,
    log_spectral_distance,
    yin_f0,
)

SR = 22050


def _tone(freq, seconds=1.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_yin_tracks_pure_tone():
    f0, voiced = yin_f0(_tone(220.0), SR)
    assert voiced.mean() > 0.9
    err = np.abs(f0[voiced] - 220.0)
    assert np.median(err) < 1.0, np.median(err)


def test_yin_tracks_harmonic_complex():
    # fundamental + harmonics (glottal-ish), YIN must not octave-jump
    t = np.arange(SR) / SR
    x = sum((0.6 ** k) * np.sin(2 * np.pi * 150.0 * (k + 1) * t)
            for k in range(5))
    f0, voiced = yin_f0(x.astype(np.float32), SR)
    assert voiced.mean() > 0.9
    assert np.median(np.abs(f0[voiced] - 150.0)) < 2.0


def test_yin_silence_and_noise_unvoiced():
    f0, voiced = yin_f0(np.zeros(SR, np.float32), SR)
    assert voiced.sum() == 0 and np.all(f0 == 0.0)
    rng = np.random.RandomState(0)
    _, v_noise = yin_f0(rng.randn(SR).astype(np.float32), SR)
    assert v_noise.mean() < 0.5  # white noise: mostly unvoiced


def test_f0_metrics_identical_and_shifted():
    a = _tone(220.0)
    m_same = f0_metrics(a, a.copy(), SR)
    assert m_same["f0_rmse_hz"] < 1e-6
    assert m_same["voicing_decision_error"] == 0.0
    assert m_same["gross_pitch_error"] == 0.0

    m_shift = f0_metrics(a, _tone(233.08), SR)  # ~1 semitone up
    assert 10.0 < m_shift["f0_rmse_hz"] < 17.0
    assert 80.0 < m_shift["f0_rmse_cents"] < 120.0
    assert m_shift["gross_pitch_error"] == 0.0  # < 20% deviation

    m_octave = f0_metrics(a, _tone(440.0), SR)  # octave error = gross
    assert m_octave["gross_pitch_error"] > 0.9


def test_f0_metrics_voicing_error():
    a = _tone(220.0)
    rng = np.random.RandomState(1)
    b = a.copy()
    b[: len(b) // 2] = 0.01 * rng.randn(len(b) // 2)  # devoice first half
    m = f0_metrics(a, b, SR)
    assert m["voicing_decision_error"] > 0.3


def test_log_spectral_distance():
    a = _tone(220.0)
    assert log_spectral_distance(a, a.copy(), SR) < 1e-6
    # 6 dB gain = flat 6 dB log-spectral offset (power: 20*log10(2));
    # exact with the dynamic-range floor disabled. With the default
    # floor, off-tone bins clamp equal in both signals, so the reading
    # shrinks (driven by in-band bins only) but stays nonzero.
    lsd = log_spectral_distance(a, 2.0 * a, SR, floor_db=None)
    assert abs(lsd - 20.0 * np.log10(2.0)) < 0.5, lsd
    assert 0.0 < log_spectral_distance(a, 2.0 * a, SR) < lsd
    # different content is far apart
    assert log_spectral_distance(a, _tone(880.0), SR) > 5.0


def test_mcd_calibration_anchors():
    """The floored MCD sits on the literature scale: identical -> 0,
    inaudible noise (40 dB SNR) -> ~1 dB, different content -> tens of
    dB, and monotonic in noise level. Without the dynamic-range floor
    the same 40 dB SNR pair reads ~60 'dB' (near-silent mel bins at the
    absolute clamp dominate) — the floor is what makes copy-synthesis
    MCD trajectories comparable to published TTS numbers."""
    from mb_istft_vits_tpu.utils.metrics import mel_cepstral_distortion

    rng = np.random.RandomState(0)
    t = np.arange(SR) / SR
    # speech-like: harmonic complex with a formant-ish envelope + pauses
    a = sum((0.5 ** k) * np.sin(2 * np.pi * 150.0 * (k + 1) * t)
            for k in range(6)).astype(np.float32)
    a[: SR // 8] = 0.0
    a[-SR // 8:] = 0.0

    def noisy(snr_db):
        n = rng.randn(len(a)).astype(np.float32)
        n *= np.sqrt((a**2).mean() / (n**2).mean()) * 10 ** (-snr_db / 20)
        return a + n

    assert mel_cepstral_distortion(a, a.copy(), SR) < 1e-6
    m40 = mel_cepstral_distortion(a, noisy(40), SR)
    m20 = mel_cepstral_distortion(a, noisy(20), SR)
    assert m40 < 3.0, m40
    assert m40 < m20
    unfloored = mel_cepstral_distortion(a, noisy(40), SR, floor_db=None,
                                        exclude_silence=False)
    assert unfloored > 10.0 * m40  # the floor is what fixes the scale
    b = _tone(523.25)  # different content entirely
    assert mel_cepstral_distortion(a, b[: len(a)], SR) > 10.0
