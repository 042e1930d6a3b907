"""DSP parity tests against torch-cpu as numerical oracle.

Every downstream fidelity claim rests on these (SURVEY.md §7 layer 1).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mb_istft_vits_tpu.dsp import (
    PQMFBank,
    hann_window,
    istft,
    mel_filterbank,
    mel_spectrogram,
    spec_to_mel,
    spectrogram,
    stft_magnitude,
)


def torch_spectrogram(y, n_fft, hop, win):
    """Reference mel_processing.spectrogram_torch semantics."""
    yt = torch.from_numpy(y)
    p = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (p, p), mode="constant").squeeze(1)
    w = torch.hann_window(win)
    spec = torch.stft(yt, n_fft, hop_length=hop, win_length=win, window=w,
                      center=False, pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    return torch.abs(spec).numpy()


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 256, 1024), (512, 128, 512)])
def test_spectrogram_matches_torch(rng, n_fft, hop, win):
    y = rng.uniform(-0.9, 0.9, size=(2, 8000)).astype(np.float32)
    ours = np.asarray(spectrogram(jnp.asarray(y), n_fft, hop, win))
    ref = torch_spectrogram(y, n_fft, hop, win)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("n_fft,hop,win", [(384, 30, 150), (171, 10, 60)])
def test_center_stft_matches_torch(rng, n_fft, hop, win):
    """MR-STFT-loss style: center=True, reflect pad, win < n_fft."""
    y = rng.uniform(-0.9, 0.9, size=(2, 3000)).astype(np.float32)
    ours = np.asarray(
        stft_magnitude(jnp.asarray(y), n_fft, hop, win, center=True)
    )
    w = torch.hann_window(win)
    ref = torch.stft(torch.from_numpy(y), n_fft, hop, win, window=w,
                     center=True, return_complex=True).abs().numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("n_fft,hop", [(16, 4), (1024, 256)])
def test_istft_matches_torch(rng, n_fft, hop):
    """Decoder-head semantics: TorchSTFT.inverse (reference stft.py:197-202)."""
    n_bins = n_fft // 2 + 1
    frames = 40
    mag = rng.uniform(0.01, 2.0, size=(3, n_bins, frames)).astype(np.float32)
    phase = rng.uniform(-np.pi, np.pi, size=(3, n_bins, frames)).astype(np.float32)

    ours = np.asarray(istft(jnp.asarray(mag), jnp.asarray(phase), n_fft, hop, n_fft))

    w = torch.hann_window(n_fft)
    spec = torch.from_numpy(mag) * torch.exp(torch.from_numpy(phase) * 1j)
    ref = torch.istft(spec, n_fft, hop, n_fft, window=w).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_stft_istft_roundtrip(rng):
    """iSTFT(STFT(x)) == x in the interior (reference §4 invariant)."""
    from mb_istft_vits_tpu.dsp.stft import TorchSTFT

    y = rng.uniform(-0.5, 0.5, size=(1, 4096)).astype(np.float32)
    st = TorchSTFT(16, 4, 16)
    mag, phase = st.transform(jnp.asarray(y))
    rec = np.asarray(st.inverse(mag, phase))[:, 0, :]
    n = min(rec.shape[1], y.shape[1])
    np.testing.assert_allclose(rec[:, 8 : n - 8], y[:, 8 : n - 8], atol=1e-3)


def test_pqmf_matches_torch_pipeline(rng):
    """Bit-level parity with the reference PQMF conv pipeline
    (pqmf.py:95-116) run in torch on CPU."""
    import torch.nn.functional as F

    from mb_istft_vits_tpu.dsp.pqmf import _pqmf_filters

    h_a, h_s = _pqmf_filters(4, 62, 0.15, 9.0)
    af = torch.from_numpy(h_a).unsqueeze(1)
    sf = torch.from_numpy(h_s).unsqueeze(0)
    ud = torch.zeros(4, 4, 4)
    for k in range(4):
        ud[k, k, 0] = 1.0
    pad = torch.nn.ConstantPad1d(31, 0.0)

    y = rng.uniform(-0.8, 0.8, size=(2, 1, 4096)).astype(np.float32)
    yt = torch.from_numpy(y)
    sub_t = F.conv1d(F.conv1d(pad(yt), af), ud, stride=4)
    rec_t = F.conv1d(pad(F.conv_transpose1d(sub_t, ud * 4, stride=4)), sf)

    bank = PQMFBank(subbands=4, taps=62)
    sub_j = bank.analysis(jnp.asarray(y.transpose(0, 2, 1)))
    assert sub_j.shape == (2, 1024, 4)
    rec_j = np.asarray(bank.synthesis(sub_j))
    np.testing.assert_allclose(
        np.asarray(sub_j), sub_t.numpy().transpose(0, 2, 1), atol=1e-5
    )
    np.testing.assert_allclose(
        rec_j[:, :, 0], rec_t.numpy()[:, 0, :], atol=1e-5
    )


def test_pqmf_reconstruction(rng):
    """synthesis(analysis(x)) reconstruction. PQMF is *near*-perfect: white
    noise maximizes band-edge aliasing, so the bound is the filterbank's
    documented residual, identical to the torch reference pipeline."""
    bank = PQMFBank(subbands=4, taps=62)
    y = rng.uniform(-0.8, 0.8, size=(2, 4096, 1)).astype(np.float32)
    rec = np.asarray(bank.synthesis(bank.analysis(jnp.asarray(y))))[:, :, 0]
    # one-sample net delay: 63-tap filters with 31-sample padding each side
    err = np.abs(y[:, 100:-101, 0] - rec[:, 101:-100]).mean()
    assert err < 0.08, err


def test_pqmf_band_major_parity(rng):
    """analysis_bm/synthesis_bm (the train-loss / MB-decoder layout,
    VERDICT r2 weak #1b) are exact layout-permutations of the
    channels-last pipeline: same math, no [*, *, subbands] 4-lane ops."""
    bank = PQMFBank(subbands=4, taps=62)
    y = rng.uniform(-0.8, 0.8, size=(2, 4100, 1)).astype(np.float32)
    sub = bank.analysis(jnp.asarray(y))            # [B, T/s, s]
    sub_bm = bank.analysis_bm(jnp.asarray(y))      # [B, s, T/s]
    np.testing.assert_allclose(
        np.asarray(sub_bm), np.asarray(sub).transpose(0, 2, 1), atol=1e-6
    )
    rec = np.asarray(bank.synthesis(sub))
    rec_bm = np.asarray(bank.synthesis_bm(sub_bm))
    np.testing.assert_allclose(rec_bm, rec, atol=1e-6)


def test_pqmf_matches_torch_reference_filters(rng):
    """Filter design matches the reference formula (pqmf.py:64-75)."""
    import scipy.signal

    from mb_istft_vits_tpu.dsp.pqmf import design_prototype_filter

    h = design_prototype_filter(62, 0.15, 9.0)
    # reference: h_i * scipy kaiser window
    n = np.arange(63) - 31.0
    with np.errstate(invalid="ignore"):
        h_ref = np.sin(np.pi * 0.15 * n) / (np.pi * n)
    h_ref[31] = 0.15
    h_ref = h_ref * scipy.signal.windows.kaiser(63, 9.0)
    np.testing.assert_allclose(h, h_ref, atol=1e-12)


def test_mel_filterbank_slaney(rng):
    """Spot-check Slaney mel filterbank properties (librosa parity)."""
    fb = mel_filterbank(22050, 1024, 80, 0.0, None)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # each filter is a normalized triangle: peak equals slaney enorm
    assert np.count_nonzero(fb.sum(axis=1) > 0) == 80
    # filters tile the spectrum: every interior bin is covered
    coverage = fb.sum(axis=0)
    assert np.all(coverage[10:500] > 0)


def test_mel_spectrogram_shapes(rng):
    y = rng.uniform(-0.9, 0.9, size=(2, 8192)).astype(np.float32)
    mel = np.asarray(mel_spectrogram(jnp.asarray(y), 1024, 80, 22050, 256,
                                     1024, 0.0, None))
    assert mel.shape == (2, 80, 32)
    spec = spectrogram(jnp.asarray(y), 1024, 256, 1024)
    mel2 = np.asarray(spec_to_mel(spec, 1024, 80, 22050, 0.0, None))
    np.testing.assert_allclose(mel, mel2, atol=1e-5)


def test_mel_cepstral_distortion():
    """MCD: identical->0; quiet additive noise -> small but nonzero;
    scipy-DCT cross-check of the cepstra."""
    from mb_istft_vits_tpu.utils.metrics import (
        _dct_matrix,
        mel_cepstral_distortion,
    )

    rng = np.random.RandomState(0)
    # broadband signal: every mel band carries energy, so the log floor
    # does not dominate (a pure tone would make MCD blow up by design)
    a = rng.randn(22050).astype(np.float32) * 0.3
    assert mel_cepstral_distortion(a, a, 22050) == 0.0
    b = a * 1.001 + rng.randn(len(a)).astype(np.float32) * 1e-4
    mcd = mel_cepstral_distortion(a, b, 22050)
    assert 0.0 < mcd < 1.0, mcd

    from scipy.fftpack import dct as scipy_dct

    x = rng.randn(80)
    ours = _dct_matrix(13, 80) @ x
    ref = scipy_dct(x, type=2, norm="ortho")[:13]
    np.testing.assert_allclose(ours, ref, atol=1e-10)
