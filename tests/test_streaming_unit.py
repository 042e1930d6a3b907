"""IncrementalTTS pipeline behavior, unit-level (no model, no jit): a
fake synthesis module lets these pin thread-lifecycle and REVOKE
semantics deterministically — sender survival after a failing transport
callback, barge-in latency bounded by one send interval (not one decode
chunk), and revoked-id release at utterance completion."""

import time

import numpy as np

from mb_istft_vits_tpu.serve import IncrementalTTS, TTSRequest


class FakeModule:
    """Shape-compatible stand-in for SynthesisModule: 1 s of audio per
    request, decoded in four chunks."""

    sampling_rate = 8000

    def prepare_shared_latents(self, text, sid=None, **kw):
        return np.zeros((10, 4), np.float32), 10, sid

    def stream_from_latents(self, z, sid=None):
        for _ in range(4):
            yield 0.1 * np.ones(2000, np.float32)


def _wait(cond, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.01)
    return False


def test_sender_survives_callback_exception():
    got, errors = [], []

    def on_chunk(uid, payload):
        if uid == "bad":
            raise RuntimeError("transport down")
        got.append(uid)

    engine = IncrementalTTS(FakeModule(), on_chunk, send_interval_ms=0,
                            base64_encode=False)
    engine.on_error = lambda uid, e: errors.append(uid)
    engine.start()
    engine.submit(TTSRequest(text="x", utterance_id="bad"))
    assert _wait(lambda: errors)  # callback raised, routed to on_error
    # the sender thread must still be alive and serving later utterances
    engine.submit(TTSRequest(text="y", utterance_id="ok"))
    assert _wait(lambda: "ok" in got), "send thread died after one error"
    assert engine._threads[1].is_alive()
    engine.stop()


def test_revoke_interrupts_paced_sending():
    """REVOKE mid-chunk must stop emission within ~one send interval;
    pre-fix the inner pacing loop drained the whole buffered decode
    chunk first (~50 chunks here)."""
    got = []
    engine = IncrementalTTS(FakeModule(), lambda uid, p: got.append(uid),
                            send_interval_ms=5, base64_encode=False)
    engine.start()
    engine.submit(TTSRequest(text="x", utterance_id="u1"))
    assert _wait(lambda: len(got) >= 3)  # pacing is underway
    engine.revoke("u1")
    n_at_revoke = len(got)
    time.sleep(0.3)  # 0.3 s = ~60 send intervals of potential overrun
    engine.stop()
    # at most a couple of in-flight chunks may slip out after revoke
    assert len(got) - n_at_revoke <= 2, (
        f"{len(got) - n_at_revoke} chunks emitted after revoke")


def test_revoked_id_released_at_completion():
    """After the revoked utterance's end marker is consumed, the id is
    released — a later (recycled) utterance with the same id plays."""
    got = []
    engine = IncrementalTTS(FakeModule(), lambda uid, p: got.append(uid),
                            send_interval_ms=0, base64_encode=False)
    engine.start()
    engine.revoke("u")
    engine.submit(TTSRequest(text="x", utterance_id="u"))  # dropped
    assert _wait(lambda: not engine._is_revoked("u")), (
        "revoked id not released at completion")
    assert got == []
    engine.submit(TTSRequest(text="x", utterance_id="u"))  # recycled id
    assert _wait(lambda: "u" in got), "recycled id stayed muted"
    engine.stop()


def test_polyphase_resample_path_total_length():
    """resample_quality='fast' routes through the polyphase stream
    resampler and flushes the filter tail: total emitted samples match
    the offline windowed-sinc resample of the full utterance."""
    import threading

    from mb_istft_vits_tpu.dsp.resample import resample_poly

    got = []
    done = threading.Event()

    def on_chunk(uid, payload):
        got.append(np.frombuffer(payload, np.int16))

    engine = IncrementalTTS(FakeModule(), on_chunk, out_sample_rate=16000,
                            send_interval_ms=0, base64_encode=False,
                            resample_quality="fast")
    engine.start()
    engine.submit(TTSRequest(text="x", utterance_id="u"))
    full = 0.1 * np.ones(8000, np.float32)  # FakeModule's 4x2000 decode
    want = resample_poly(full, 8000, 16000, "fast")
    assert _wait(lambda: sum(len(g) for g in got) >= len(want))
    engine.stop()
    y = np.concatenate(got).astype(np.float32) / 32767.0
    assert len(y) == len(want)
    # mid-utterance samples sit at the constant 0.1 (sinc ripple < 1e-3)
    assert np.abs(y[2000:-2000] - 0.1).max() < 2e-3


def test_resample_quality_validated():
    import pytest

    with pytest.raises(ValueError):
        IncrementalTTS(FakeModule(), lambda *a: None,
                       resample_quality="bogus")
