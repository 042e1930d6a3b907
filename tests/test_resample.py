"""Windowed-sinc polyphase resampler (dsp/resample.py).

Quality parity target: the reference serving stack's librosa.resample
(reference tts_vits.py:182-185). Pins: tone fidelity, alias rejection,
offline == jax-conv == chunked-streaming, librosa-style output lengths.
"""

import numpy as np
import pytest

from mb_istft_vits_tpu.dsp.resample import (
    PolyphaseStreamResampler,
    design_resample_filter,
    resample_poly,
    resample_poly_jax,
)


def _tone(freq, sr, seconds=1.0):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t)


def test_output_length_and_identity():
    x = np.random.RandomState(0).randn(13337)
    assert np.allclose(resample_poly(x, 16000, 16000), x.astype(np.float32))
    # ceil(T * L / M) like scipy.signal.resample_poly
    assert len(resample_poly(x, 22050, 16000)) == -(-13337 * 320 // 441)
    assert len(resample_poly(x, 16000, 32000)) == 2 * 13337
    assert len(resample_poly(x, 32000, 16000)) == -(-13337 // 2)


@pytest.mark.parametrize("quality,min_snr", [("fast", 60.0), ("best", 80.0)])
def test_tone_fidelity(quality, min_snr):
    sr_in, sr_out, f = 22050, 16000, 1000.0
    y = resample_poly(_tone(f, sr_in), sr_in, sr_out, quality)
    ref = _tone(f, sr_out, len(y) / sr_out)[: len(y)]
    sl = slice(800, len(y) - 800)  # skip filter edge transients
    snr = 10 * np.log10(
        np.mean(ref[sl] ** 2) / np.mean((y[sl] - ref[sl]) ** 2))
    assert snr > min_snr, snr


@pytest.mark.parametrize("quality,min_att", [("fast", 70.0), ("best", 80.0)])
def test_alias_rejection(quality, min_att):
    # 9.5 kHz is above the 8 kHz output Nyquist: it must be filtered out,
    # not aliased into the output band (a linear resampler leaves ~-30 dB)
    sr_in, sr_out = 22050, 16000
    x = _tone(9500.0, sr_in)
    y = resample_poly(x, sr_in, sr_out, quality)
    sl = slice(800, len(y) - 800)
    att = 10 * np.log10(np.mean(x ** 2) / max(np.mean(y[sl] ** 2), 1e-30))
    assert att > min_att, att


def test_jax_conv_path_matches_numpy():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4096, 3).astype(np.float32)
    yj = np.asarray(resample_poly_jax(x, 22050, 16000, "fast"))
    for b in range(2):
        for c in range(3):
            yn = resample_poly(x[b, :, c], 22050, 16000, "fast")
            np.testing.assert_allclose(yj[b, :, c], yn, atol=2e-5)


def test_jax_conv_path_jits():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda v: resample_poly_jax(v, 16000, 22050, "fast"))
    x = jnp.zeros((1, 1024, 1))
    assert f(x).shape == (1, -(-1024 * 441 // 320), 1)


def test_streaming_matches_offline_bitwise():
    rng = np.random.RandomState(2)
    x = rng.randn(13337)
    for sr_in, sr_out in [(22050, 16000), (16000, 22050), (32000, 16000)]:
        sr = PolyphaseStreamResampler(sr_in, sr_out, "fast")
        outs, i = [], 0
        while i < len(x):
            n = int(rng.randint(1, 900))
            outs.append(sr(x[i : i + n]))
            i += n
        outs.append(sr.flush())
        y_stream = np.concatenate(outs)
        y_off = resample_poly(x, sr_in, sr_out, "fast")
        assert len(y_stream) == len(y_off)
        np.testing.assert_array_equal(y_stream, y_off)


def test_streaming_identity_and_double_flush():
    sr = PolyphaseStreamResampler(16000, 16000)
    x = np.ones(100, np.float32)
    assert np.array_equal(sr(x), x)
    assert len(sr.flush()) == 0
    sr2 = PolyphaseStreamResampler(22050, 16000)
    sr2(np.ones(1000))
    sr2.flush()
    assert len(sr2.flush()) == 0  # idempotent


def test_filter_dc_gain():
    # DC gain L compensates zero-stuffing: a constant resamples to the
    # same constant
    y = resample_poly(np.ones(8000), 22050, 16000, "best")
    assert np.abs(y[2000:-2000] - 1.0).max() < 1e-3
    h = design_resample_filter(320, 441, "fast")
    assert abs(h.sum() - 320.0) < 1e-9
