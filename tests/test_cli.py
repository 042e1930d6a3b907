"""CLI entry-point smoke tests (reference run_synthesis.py /
run_synthesis_z.py + voice conversion, models.py:790-798).

Each CLI is run as a real subprocess on a tiny config: pins argparse
plumbing, the JAX_PLATFORMS pin (utils/platform.py), wav writing, and
the exit status — the things library-level tests can't see. Single
CPU device per worker keeps them fast.
"""

import pytest

import json
import wave

import numpy as np

from tests.subproc import run_cli as _run_cli
from tests.test_infer import TINY_CONFIG

pytestmark = pytest.mark.slow  # subprocess drives / full-program compiles


def _read_wav(path):
    with wave.open(str(path), "rb") as w:
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        return pcm, w.getframerate()


def test_run_synthesis_cli(tmp_path):
    cfg = tmp_path / "tiny.json"
    cfg.write_text(json.dumps(TINY_CONFIG))
    out_wav = tmp_path / "out.wav"
    r = _run_cli("run_synthesis.py",
                 ["-c", str(cfg), "-t", "k o N n i t i w a",
                  "-o", str(out_wav)], cwd=str(tmp_path))
    assert "Real Time Factor" in r.stdout
    pcm, sr = _read_wav(out_wav)
    assert sr == TINY_CONFIG["data"]["sampling_rate"]
    assert len(pcm) > 0 and np.any(pcm != 0)


def test_run_synthesis_z_cli(tmp_path):
    cfg = tmp_path / "tiny.json"
    cfg.write_text(json.dumps(TINY_CONFIG))
    r = _run_cli("run_synthesis_z.py",
                 ["-c", str(cfg), "-t", "k o N n i t i w a"],
                 cwd=str(tmp_path))
    # the z round trip re-decodes the same latents: bit-identical audio
    # (reference run_synthesis_z.py:15-39 saves both for comparison)
    assert "max |normal - z_decode|" in r.stdout
    a1, _ = _read_wav(tmp_path / "output_normal.wav")
    a2, _ = _read_wav(tmp_path / "output_z.wav")
    n = min(len(a1), len(a2))
    assert n > 0 and np.array_equal(a1[:n], a2[:n])


def test_run_voice_conversion_cli(tmp_path):
    cfg_dict = json.loads(json.dumps(TINY_CONFIG))
    cfg_dict["data"]["n_speakers"] = 4
    cfg_dict["model"]["gin_channels"] = 8
    cfg = tmp_path / "tiny_ms.json"
    cfg.write_text(json.dumps(cfg_dict))

    sr = cfg_dict["data"]["sampling_rate"]
    t = np.arange(sr) / sr  # 1 s of 220 Hz sine
    pcm = (0.3 * 32767 * np.sin(2 * np.pi * 220 * t)).astype(np.int16)
    src = tmp_path / "src.wav"
    with wave.open(str(src), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())

    out_wav = tmp_path / "converted.wav"
    _run_cli("run_voice_conversion.py",
             ["-c", str(cfg), "-i", str(src), "--sid-src", "1",
              "--sid-tgt", "2", "-o", str(out_wav)], cwd=str(tmp_path))
    conv, out_sr = _read_wav(out_wav)
    assert out_sr == sr
    # VC preserves duration up to STFT framing (spec frames * hop)
    assert abs(len(conv) - len(pcm)) <= cfg_dict["data"]["filter_length"]
    assert np.any(conv != 0)


def test_run_batch_synthesis_cli(tmp_path):
    cfg = tmp_path / "tiny.json"
    cfg.write_text(json.dumps(TINY_CONFIG))
    filelist = tmp_path / "batch.txt"
    filelist.write_text(
        "uttA|k o N n i t i w a\n"
        "uttB|a i u e o\n"
        "uttA|s a y o: n a r a\n"  # duplicate name: must be uniquified
    )
    out_dir = tmp_path / "out"
    r = _run_cli("run_batch_synthesis.py",
                 ["-c", str(cfg), "-f", str(filelist),
                  "-o", str(out_dir), "--batch", "4"], cwd=str(tmp_path))
    wavs = sorted(p.name for p in out_dir.glob("*.wav"))
    assert len(wavs) == 3, (wavs, r.stdout)
    assert "uttA.wav" in wavs and "uttB.wav" in wavs
    for p in out_dir.glob("*.wav"):
        pcm, sr = _read_wav(p)
        assert sr == TINY_CONFIG["data"]["sampling_rate"] and len(pcm) > 0
