"""Native wav-parser robustness: arbitrary malformed headers must never
crash the process (native/audio.cpp returns -1 and the Python caller
falls back) — a corrupt fmt chunk used to SIGFPE on bits_per_sample==0,
which kills the whole training process, not just one file."""

import os
import struct
import wave

import numpy as np
import pytest

from mb_istft_vits_tpu.data import native_audio


def _valid_wav(path, n=64, sr=8000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.arange(n, dtype=np.int16).tobytes())


@pytest.mark.skipif(not native_audio.available(),
                    reason="native audio loader unavailable")
def test_wav_parser_survives_malformed_headers(tmp_path):
    rng = np.random.RandomState(0)
    base = tmp_path / "ok.wav"
    _valid_wav(base)
    blob = bytearray(base.read_bytes())

    cases = []
    # zeroed bits_per_sample (the SIGFPE case: fmt chunk offset 34)
    b = bytearray(blob)
    struct.pack_into("<H", b, 34, 0)
    cases.append(("bits0", bytes(b)))
    # absurd channel count / format code
    b = bytearray(blob)
    struct.pack_into("<H", b, 22, 0)
    cases.append(("ch0", bytes(b)))
    b = bytearray(blob)
    struct.pack_into("<H", b, 20, 0xFFFF)
    cases.append(("fmt_bad", bytes(b)))
    # truncations at every interesting boundary
    for cut in (0, 4, 11, 12, 20, 36, 43, 44, 50):
        cases.append((f"trunc{cut}", bytes(blob[:cut])))
    # random byte flips across the header
    for i in range(40):
        b = bytearray(blob)
        for _ in range(rng.randint(1, 6)):
            b[rng.randint(0, min(64, len(b)))] = rng.randint(0, 256)
        cases.append((f"flip{i}", bytes(b)))
    # pure garbage
    for i in range(10):
        cases.append((f"junk{i}",
                      rng.bytes(int(rng.randint(1, 2000)))))

    for name, payload in cases:
        p = tmp_path / f"{name}.wav"
        p.write_bytes(payload)
        # must not crash; None (fallback) or a sane array are both fine
        out = native_audio.load_wav(str(p))
        if out is not None:
            y, sr = out
            assert sr > 0 and np.all(np.isfinite(y))

    # the pristine file still reads correctly after all that
    y, sr = native_audio.load_wav(str(base))
    assert sr == 8000 and len(y) == 64
    assert np.array_equal(y.astype(np.int16), np.arange(64, dtype=np.int16))


@pytest.mark.skipif(not native_audio.available(),
                    reason="native audio loader unavailable")
def test_wav_parser_odd_fmt_extension(tmp_path):
    """A WAVEFORMATEXTENSIBLE-style fmt chunk with an ODD size is legal
    RIFF (pad byte follows); the parser must still find the data chunk."""
    n, sr = 32, 8000
    pcm = np.arange(n, dtype=np.int16).tobytes()
    fmt_ext = b"\x00" * 3  # 19-byte fmt body: 16 standard + 3 extension
    fmt_body = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16) + fmt_ext
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"\x00"  # RIFF pad byte for the odd-sized chunk
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    p = tmp_path / "oddfmt.wav"
    p.write_bytes(riff)

    out = native_audio.load_wav(str(p))
    assert out is not None, "odd-sized fmt extension desynced the parser"
    y, got_sr = out
    assert got_sr == sr and len(y) == n
    assert np.array_equal(y.astype(np.int16), np.arange(n, dtype=np.int16))
