"""Serving-layer tests: SynthesisModule buckets, chunked streaming decode,
incremental TTS pipeline."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # module fixture compiles serving programs

TINY_CONFIG = {
    "train": {
        "log_interval": 10, "eval_interval": 100, "seed": 1234,
        "epochs": 1, "learning_rate": 2e-4, "betas": [0.8, 0.99],
        "eps": 1e-9, "batch_size": 2, "fp16_run": False,
        "lr_decay": 0.999875, "segment_size": 512, "c_mel": 45, "c_kl": 1.0,
        "fft_sizes": [32, 64], "hop_sizes": [8, 16], "win_lengths": [32, 64],
        "window": "hann_window",
    },
    "data": {
        "training_files": "", "validation_files": "",
        "text_cleaners": ["japanese_cleaners"], "text_module": "text_JP",
        "max_wav_value": 32768.0, "sampling_rate": 8000,
        "filter_length": 256, "hop_length": 64, "win_length": 256,
        "n_mel_channels": 20, "mel_fmin": 0.0, "mel_fmax": None,
        "add_blank": True, "n_speakers": 0, "cleaned_text": True,
    },
    "model": {
        "ms_istft_vits": False, "mb_istft_vits": True, "istft_vits": False,
        "subbands": 4, "gen_istft_n_fft": 16, "gen_istft_hop_size": 4,
        "inter_channels": 16, "hidden_channels": 16, "filter_channels": 32,
        "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.1,
        "resblock": "2", "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "upsample_rates": [2, 2], "upsample_initial_channel": 32,
        "upsample_kernel_sizes": [4, 4], "use_spectral_norm": False,
        "use_sdp": False,
    },
}


@pytest.fixture(scope="module")
def module(tmp_path_factory):
    path = tmp_path_factory.mktemp("cfg") / "tiny.json"
    path.write_text(json.dumps(TINY_CONFIG))
    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule

    m = SynthesisModule(str(path))
    m.TEXT_BUCKETS = (32, 64)
    m.FRAME_BUCKETS = (64, 128, 256)
    return m


TEXT = "k o N n i t i w a s e k a i k o r e w a t e s u t o d e s u"


def test_synthesize(module):
    audio, timings = module.synthesize(TEXT, seed=0)
    assert audio.ndim == 1 and len(audio) > 0
    assert len(audio) % module.hop_length == 0
    assert np.all(np.isfinite(audio))
    assert timings["rtf"] > 0


def test_synthesize_timing_split(module):
    """timings carries the e2e latency split (VERDICT r3 weak #3):
    frontend + dispatch + sync are each nonnegative and sum to <= total
    (total also covers host-side trim/scale work)."""
    _, t = module.synthesize(TEXT, seed=0)
    for k in ("frontend", "dispatch", "sync"):
        assert t[k] >= 0.0
    assert t["dispatch"] + t["sync"] <= t["total"] + 1e-6


def test_serving_hot_path_caches(module):
    """Repeated texts hit the ids + device-input caches (no regex
    frontend, no fresh H2D upload) and still produce identical audio;
    knob scalars and seed keys are cached device-resident."""
    a1, _ = module.synthesize(TEXT, seed=3)
    ids1 = module.text_to_ids(TEXT)
    assert ids1 is module.text_to_ids(TEXT)  # cache hit: same object
    x1, _ = module._pad_ids_cached(ids1)
    x2, _ = module._pad_ids_cached(module.text_to_ids(TEXT))
    assert x1 is x2
    assert module._dev_scalar(0.667) is module._dev_scalar(0.667)
    assert module._seed_key(3) is module._seed_key(3)
    a2, _ = module.synthesize(TEXT, seed=3)
    np.testing.assert_array_equal(a1, a2)


def test_synthesize_deterministic_with_seed(module):
    a1, _ = module.synthesize(TEXT, seed=42)
    a2, _ = module.synthesize(TEXT, seed=42)
    np.testing.assert_array_equal(a1, a2)


def test_z_roundtrip(module):
    audio, z, _ = module.synthesize_with_z(TEXT, seed=1)
    audio2 = module.infer_z_only(z)
    n = min(len(audio), len(audio2))
    np.testing.assert_allclose(audio[:n], audio2[:n], atol=1e-4)


def test_chunked_decode_matches_full(module):
    z, y_len, sid = module.prepare_shared_latents(TEXT, seed=2)
    full = module.infer_z_only(z, sid)
    chunked = module.synthesize_from_shared_latents(
        z, sid, chunk_frames=16, overlap_frames=4
    )
    assert len(chunked) == len(full)
    # interior samples (away from crossfade boundaries) should agree well;
    # the overall signals should be strongly correlated
    c = np.corrcoef(full, chunked)[0, 1]
    assert c > 0.98, c


def test_staged_timings(module):
    audio, timings = module.synthesize_staged(TEXT, seed=3)
    assert set(timings) >= {"latents", "waveform_decoder", "total", "rtf"}
    assert np.all(np.isfinite(audio))


def test_incremental_tts_pipeline(module):
    from mb_istft_vits_tpu.serve import IncrementalTTS, TTSRequest

    chunks = []
    engine = IncrementalTTS(
        module, on_chunk=lambda uid, payload: chunks.append((uid, payload)),
        send_interval_ms=0, base64_encode=False,
    )
    engine.start()
    engine.submit(TTSRequest(text=TEXT, utterance_id="u1", noise_scale=0.0))
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if chunks and chunks[-1][0] == "u1":
            # wait for end-of-utterance flush: engine puts None marker,
            # sender drains; just wait until chunk count stabilizes
            n = len(chunks)
            time.sleep(1.0)
            if len(chunks) == n:
                break
        time.sleep(0.2)
    engine.stop()
    assert len(chunks) > 3
    pcm = np.concatenate([
        np.frombuffer(payload, np.int16) for _, payload in chunks
    ])
    assert len(pcm) > 1000
    assert np.abs(pcm.astype(np.float32)).max() < 32768


def test_revoke(module):
    from mb_istft_vits_tpu.serve import IncrementalTTS, TTSRequest

    chunks = []
    engine = IncrementalTTS(
        module, on_chunk=lambda uid, p: chunks.append(uid),
        send_interval_ms=0, base64_encode=False,
    )
    engine.revoke("dead")
    engine.start()
    engine.submit(TTSRequest(text=TEXT, utterance_id="dead"))
    import time

    time.sleep(2.0)
    engine.stop()
    assert chunks == []


def test_synthesize_batch(module):
    texts = [TEXT, "a i u e o", "k o N n i t i w a"]
    audios, timings = module.synthesize_batch(texts, seed=5)
    assert len(audios) == 3
    assert all(len(a) > 0 and np.all(np.isfinite(a)) for a in audios)
    assert timings["utterances_per_sec"] > 0
    # batch result matches single-utterance synthesis for the same seed?
    # (not bit-equal: different padding; just check nonzero + sane scale)
    assert max(np.abs(a).max() for a in audios) < 100


def test_synthesize_batch_out_sample_rate(module):
    """On-device output-rate conversion: lengths scale by the rational
    ratio and the audio matches a host-side windowed-sinc resample of
    the model-rate batch output."""
    from mb_istft_vits_tpu.dsp.resample import resample_poly

    texts = [TEXT, "a i u e o"]
    base, _ = module.synthesize_batch(texts, seed=5)
    sr_in = module.sampling_rate
    sr_out = 2 * sr_in  # exact rational, exercises upsampling
    res, timings = module.synthesize_batch(texts, seed=5,
                                           out_sample_rate=sr_out)
    assert timings["audio_seconds"] > 0
    for a0, a1 in zip(base, res):
        assert len(a1) == -(-len(a0) * sr_out // sr_in)
        want = resample_poly(a0, sr_in, sr_out, "fast")
        # int16 quantization on both paths -> ~1e-4; skip the last
        # filter-reach samples: the fused path's sinc tail sees the
        # decoder's real continuation past the trim point, the host
        # path sees implicit zeros
        reach = 64
        np.testing.assert_allclose(a1[:-reach], want[:-reach], atol=5e-4)
        assert np.all(np.isfinite(a1))


def test_serving_from_orbax_checkpoint(module, tmp_path):
    """SynthesisModule loads this framework's own orbax checkpoints (a
    model dir or a ckpt/<step> path) and produces the same audio as the
    in-memory params."""
    import jax

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule
    from mb_istft_vits_tpu.train import create_train_state
    from mb_istft_vits_tpu.train.checkpoint import save_checkpoint

    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(TINY_CONFIG))
    cfg = Config.from_json(str(cfg_path))
    import jax.numpy as jnp

    batch = {
        "x": jnp.ones((2, 8), jnp.int32),
        "x_lengths": jnp.full((2,), 8, jnp.int32),
        "spec": jnp.ones((2, 16, 129), jnp.float32),
        "spec_lengths": jnp.full((2,), 16, jnp.int32),
    }
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(1), batch)
    model_dir = str(tmp_path / "logs" / "m")
    save_checkpoint(model_dir, 7, state)

    loaded = SynthesisModule(str(cfg_path), checkpoint_path=model_dir)
    loaded.TEXT_BUCKETS = module.TEXT_BUCKETS
    loaded.FRAME_BUCKETS = module.FRAME_BUCKETS
    direct = SynthesisModule(str(cfg_path), params=state.params_g)
    direct.TEXT_BUCKETS = module.TEXT_BUCKETS
    direct.FRAME_BUCKETS = module.FRAME_BUCKETS
    a1, _ = loaded.synthesize("a i u e o", seed=2)
    a2, _ = direct.synthesize("a i u e o", seed=2)
    np.testing.assert_array_equal(a1, a2)


def test_synthesize_text_beyond_buckets(module):
    """Text longer than the largest TEXT_BUCKET must synthesize (fresh
    64-granule program), not crash or truncate."""
    long_text = " ".join(["k o N n i t i w a"] * 6)  # > 64 tokens w/ blanks
    ids = module.text_to_ids(long_text)
    assert len(ids) > max(module.TEXT_BUCKETS)
    audio, timings = module.synthesize(long_text, seed=0)
    assert len(audio) > 0 and np.all(np.isfinite(audio))


def test_synthesize_batch_multichip(module, tmp_path):
    """Batched synthesis sharded over a 4-device mesh matches the
    single-device result for the same seed (offline fan-out over ICI,
    SURVEY.md §5.7 plan)."""
    import jax

    assert jax.device_count() >= 4
    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule
    from mb_istft_vits_tpu.parallel import create_mesh

    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(TINY_CONFIG))
    sharded = SynthesisModule(str(cfg_path), params=module.params,
                              mesh=create_mesh(4))
    sharded.TEXT_BUCKETS = module.TEXT_BUCKETS
    sharded.FRAME_BUCKETS = module.FRAME_BUCKETS
    texts = [TEXT, "a i u e o", "k o N n i t i w a", "t e s u t o", TEXT]
    a_single, _ = module.synthesize_batch(texts, seed=5)
    a_mesh, timings = sharded.synthesize_batch(texts, seed=5)
    assert len(a_mesh) == len(a_single) == 5
    for a, b in zip(a_single, a_mesh):
        assert len(a) == len(b)
        np.testing.assert_allclose(a, b, atol=5e-4)
    assert timings["utterances_per_sec"] > 0


def test_decode_chunks_batched_matches_streaming(module):
    """The one-dispatch batched chunk decode must reproduce the
    pipelined streaming path exactly (same per-chunk programs, shared
    _ola_join) — uniform chunk plan on both sides."""
    z, y_len, sid = module.prepare_shared_latents(TEXT, seed=3)
    streamed = module.synthesize_from_shared_latents(
        z, sid, chunk_frames=16, overlap_frames=4, grow_chunks=False)
    batched = module.decode_chunks_batched(
        z, sid, chunk_frames=16, overlap_frames=4)
    assert len(batched) == len(streamed) == y_len * module.hop_length
    np.testing.assert_allclose(batched, streamed, atol=5e-5)


def test_stream_growing_chunks_reconstructs(module):
    """Default streaming now doubles chunk sizes after the first (O(log T)
    dispatch round trips); the joined waveform must still reconstruct the
    full decode and keep the exact sample count."""
    z, y_len, sid = module.prepare_shared_latents(TEXT, seed=3)
    full = module.infer_z_only(z, sid)
    chunks = list(module.stream_from_latents(z, sid, chunk_frames=8,
                                             overlap_frames=4))
    # first body stays small (TTFA contract): 8 frames + crossfade holdback
    assert len(chunks[0]) <= 8 * module.hop_length
    streamed = np.concatenate(chunks)
    assert len(streamed) == len(full) == y_len * module.hop_length
    c = np.corrcoef(full, streamed)[0, 1]
    assert c > 0.97, c


def test_decode_chunks_batched_multichip(module, tmp_path):
    """A single long utterance's chunks fan out over a 4-device mesh
    (sequence-parallel offline decode, SURVEY.md §5.7 plan) and match
    the single-device batched result."""
    import jax

    assert jax.device_count() >= 4
    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule
    from mb_istft_vits_tpu.parallel import create_mesh

    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(TINY_CONFIG))
    sharded = SynthesisModule(str(cfg_path), params=module.params,
                              mesh=create_mesh(4))
    sharded.TEXT_BUCKETS = module.TEXT_BUCKETS
    sharded.FRAME_BUCKETS = module.FRAME_BUCKETS
    z, y_len, sid = module.prepare_shared_latents(TEXT, seed=13)
    single = module.decode_chunks_batched(
        z, sid, chunk_frames=16, overlap_frames=4)
    fanned = sharded.decode_chunks_batched(
        z, sid, chunk_frames=16, overlap_frames=4)
    assert len(fanned) == len(single)
    np.testing.assert_allclose(fanned, single, atol=5e-4)


def test_spec_join_batched_matches_pipelined(module):
    """decode_spec_join(batched=True) — all chunks in one dispatch —
    must reproduce the pipelined spec-domain join."""
    z, y_len, sid = module.prepare_shared_latents(TEXT, seed=5)
    pipelined = module.decode_spec_join(
        z, sid, chunk_frames=16, overlap_frames=4)
    one_shot = module.decode_spec_join(
        z, sid, chunk_frames=16, overlap_frames=4, batched=True)
    assert len(one_shot) == len(pipelined) == y_len * module.hop_length
    np.testing.assert_allclose(one_shot, pipelined, atol=5e-5)


def test_stream_resampler_continuous():
    """The streaming resampler must produce the same sample grid
    regardless of chunking — the grid (and interpolation) carries across
    chunk boundaries instead of restarting per chunk."""
    from mb_istft_vits_tpu.serve.streaming import StreamResampler

    rng_ = np.random.RandomState(0)
    audio = rng_.randn(22050).astype(np.float32)
    sr_in, sr_out = 22050, 48000
    step = sr_in / sr_out
    # un-chunked reference on the same fixed-step grid
    ts = np.arange(0.0, len(audio) - 1 + 1e-9, step)
    ref = np.interp(ts, np.arange(len(audio)), audio).astype(np.float32)

    for chunk_sz in (160, 1000, 4096):
        rs = StreamResampler(sr_in, sr_out)
        out = np.concatenate([
            rs(audio[i: i + chunk_sz])
            for i in range(0, len(audio), chunk_sz)
        ])
        assert len(out) == len(ref), (chunk_sz, len(out), len(ref))
        np.testing.assert_allclose(out, ref, atol=1e-6,
                                   err_msg=f"chunk={chunk_sz}")


def test_spec_join_length_at_granule_multiple(module):
    """When the joined spectrogram frame count lands exactly on the tail
    bucket granule, the center=True iSTFT yields (bucket-1)*hop samples —
    the bucket must cover one extra frame or the output comes up short
    (regression: silently returned t_total*hop - istft_hop*subbands
    samples for t_total % 16 == 0)."""
    z, y_len, sid = module.prepare_shared_latents(TEXT, seed=17)
    t = 64  # multiple of 16 -> f_total is a granule multiple
    assert z.shape[0] >= t, z.shape
    out = module.decode_spec_join(z[:t], sid, chunk_frames=16,
                                  overlap_frames=4)
    assert len(out) == t * module.hop_length, (len(out), t * module.hop_length)


def test_chunked_decode_xcorr_align(module):
    z, y_len, sid = module.prepare_shared_latents(TEXT, seed=7)
    full = module.infer_z_only(z, sid)
    chunked = np.concatenate(list(module.stream_from_latents(
        z, sid, chunk_frames=16, overlap_frames=4, xcorr_align=True)))
    assert len(chunked) == len(full)
    c = np.corrcoef(full, chunked)[0, 1]
    assert c > 0.97, c


def test_spec_join_single_chunk_matches_full(module):
    """With one chunk there are no joins: the spec-domain tail must
    reproduce the full decoder output (validates the iSTFT+PQMF tail
    split, reference models.py:366-377)."""
    z, y_len, sid = module.prepare_shared_latents(TEXT, seed=6)
    full = module.infer_z_only(z, sid)
    joined = module.decode_spec_join(z, sid, chunk_frames=256,
                                     overlap_frames=0)
    # the last few frames differ by construction: the full decode's iSTFT
    # overlap-adds contributions from padded frames beyond the valid region
    # (the exp-magnitude head is never zero), the joined tail pads with
    # silence — compare away from that boundary
    n = min(len(full), len(joined)) - 4 * module.hop_length
    np.testing.assert_allclose(joined[:n], full[:n], atol=2e-3)


def test_spec_join_chunked(module):
    """Spectrogram-domain overlap join (infer.ipynb cells 9-12)."""
    z, y_len, sid = module.prepare_shared_latents(TEXT, seed=7)
    full = module.infer_z_only(z, sid)
    for kw in ({}, {"frame_xcorr": True}):
        joined = module.decode_spec_join(z, sid, chunk_frames=16,
                                         overlap_frames=4, **kw)
        assert len(joined) == len(full)
        assert np.all(np.isfinite(joined))
        c = np.corrcoef(full, joined)[0, 1]
        assert c > 0.98, (kw, c)


def test_spec_join_multistream_variant(tmp_path):
    """The MS decoder's learned synthesis filter is applied in the
    spec-domain tail (reference models.py:461-467)."""
    import copy
    import json as _json

    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["model"]["mb_istft_vits"] = False
    cfg["model"]["ms_istft_vits"] = True
    path = tmp_path / "tiny_ms.json"
    path.write_text(_json.dumps(cfg))
    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule

    m = SynthesisModule(str(path))
    m.TEXT_BUCKETS = (32, 64)
    m.FRAME_BUCKETS = (64, 128, 256)
    z, y_len, sid = m.prepare_shared_latents(TEXT, seed=8)
    full = m.infer_z_only(z, sid)
    joined = m.decode_spec_join(z, sid, chunk_frames=256, overlap_frames=0)
    n = min(len(full), len(joined)) - 4 * m.hop_length
    np.testing.assert_allclose(joined[:n], full[:n], atol=2e-3)


def test_synthesize_by_phrases(module):
    """Phrase-boundary incremental synthesis (the intended behavior of the
    reference's shared-latents chunking, synthesis_module.py:193-353)."""
    text = ("k o N n i t i w a sp s e k a i sp k o r e w a t e s u t o")
    z, y_len, sid, w = module.prepare_shared_latents(
        text, return_durations=True, seed=9)
    assert len(w) > 0 and abs(float(np.sum(w)) - y_len) <= 1
    bounds = module.phrase_frame_boundaries(text, w)
    assert len(bounds) == 2
    assert all(0 < b < y_len for b in bounds)
    pieces = module.synthesize_by_phrases(text, seed=9)
    assert len(pieces) == 3
    total = sum(len(p) for p in pieces)
    assert total == y_len * module.hop_length


def test_spec_join_singleband_variant(tmp_path):
    """Spec-domain tail for the full-band iSTFT head (reference
    models.py:294-296)."""
    import copy
    import json as _json

    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["model"]["mb_istft_vits"] = False
    cfg["model"]["istft_vits"] = True
    cfg["model"]["subbands"] = False
    cfg["model"]["upsample_rates"] = [4, 4]
    cfg["model"]["upsample_kernel_sizes"] = [8, 8]
    path = tmp_path / "tiny_fb.json"
    path.write_text(_json.dumps(cfg))
    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule

    m = SynthesisModule(str(path))
    m.TEXT_BUCKETS = (32, 64)
    m.FRAME_BUCKETS = (64, 128, 256)
    z, y_len, sid = m.prepare_shared_latents(TEXT, seed=8)
    full = m.infer_z_only(z, sid)
    joined = m.decode_spec_join(z, sid, chunk_frames=256, overlap_frames=0)
    n = min(len(full), len(joined)) - 4 * m.hop_length
    np.testing.assert_allclose(joined[:n], full[:n], atol=2e-3)


def test_chunked_decode_zero_overlap(module):
    """overlap_frames=0 must butt-join chunks losslessly in both the
    waveform and spectrogram joiners (regression: body[:-0] is empty in
    numpy slicing)."""
    z, y_len, sid = module.prepare_shared_latents(TEXT, seed=11)
    wave = module.synthesize_from_shared_latents(
        z, sid, chunk_frames=16, overlap_frames=0)
    assert len(wave) == y_len * module.hop_length
    spec = module.decode_spec_join(z, sid, chunk_frames=16, overlap_frames=0)
    assert len(spec) == y_len * module.hop_length
    assert np.all(np.isfinite(wave)) and np.all(np.isfinite(spec))


def test_synthesize_empty_and_single_token(module):
    """Degenerate inputs must not crash or emit non-finite audio."""
    for t in ["", "   ", "a"]:
        audio, _ = module.synthesize(t, seed=0)
        assert len(audio) > 0 and np.all(np.isfinite(audio)), repr(t)


def test_warmup_precompiles(module):
    """warmup() compiles the probe + infer programs for the given bucket
    pairs; a following synthesize call on those shapes must NOT trigger
    any new compilation (jit cache size unchanged)."""
    module.warmup(pairs=[(32, 64)])
    fn = module._infer_jit(64)
    n0 = fn._cache_size()
    assert n0 >= 1
    audio, timings = module.synthesize("a i u e o", seed=1)  # -> (32, 64)
    assert timings["frame_bucket"] == 64
    assert fn._cache_size() == n0
    assert len(audio) > 0 and np.all(np.isfinite(audio))


def test_raw_japanese_text_routes_through_serving_cleaner(module,
                                                          monkeypatch):
    """SynthesisModule.text_to_ids(cleaned=False) on a text_JP config
    uses the reference serving module's raw-text cleaner (kana
    conversion + mora tables), not the config's training cleaners —
    which cannot tokenize raw Japanese at all."""
    import sys
    import types

    fake = types.ModuleType("pyopenjtalk")
    fake.g2p = lambda text, kana=False: "コンニチハ"
    monkeypatch.setitem(sys.modules, "pyopenjtalk", fake)

    ids_raw = module.text_to_ids("こんにちは", cleaned=False)
    ids_cleaned = module.text_to_ids("k o N n i t i h a", cleaned=True)
    assert len(ids_raw) > 0
    assert np.array_equal(ids_raw, ids_cleaned)


def test_long_text_auto_route(module):
    """Texts beyond MAX_TEXT_TOKENS auto-route through the phrase-split
    path (VERDICT r4 #6): pieces cut at pause symbols, each synthesized
    by the same bounded compiled buckets, concatenated — instead of
    compiling a quadratic-attention program (or OOMing) on one huge
    text. Exercises a ~5k-token input through the PUBLIC API."""
    old = module.MAX_TEXT_TOKENS
    module.MAX_TEXT_TOKENS = 48
    try:
        # ~25 phoneme tokens with a pause marker per sentence; repeated
        # to ~5k ids after blank-interspersal
        sent = "k o N n i t i w a s e k a i sp "
        long_text = sent * 170
        ids = module.text_to_ids(long_text)
        assert len(ids) > 4500, len(ids)
        audio, timings = module.synthesize(long_text, seed=0)
        assert timings["pieces"] > 1
        assert np.all(np.isfinite(audio)) and len(audio) > 0
        assert len(audio) % module.hop_length == 0
        # every piece respected the single-program ceiling
        assert timings["frame_bucket"] <= module.MAX_FRAMES
        # piece seams: the audio is the concatenation of per-piece calls;
        # total time accounting holds
        assert timings["dispatch"] + timings["sync"] <= timings["total"]

        # want_z path concatenates latents too
        audio2, z, _ = module.synthesize_with_z(long_text, seed=0)
        assert z is not None and z.ndim == 2
        assert len(audio2) == z.shape[0] * module.hop_length
    finally:
        module.MAX_TEXT_TOKENS = old


def test_split_long_ids_prefers_boundaries(module):
    """_split_long_ids cuts AFTER the last pause/punct token inside each
    window and hard-splits only boundary-free windows."""
    symbols = None
    from mb_istft_vits_tpu.text import get_symbols
    symbols = get_symbols(module.data_cfg.text_module)
    sp = symbols.index("sp")
    a = symbols.index("a")
    old = module.MAX_TEXT_TOKENS
    module.MAX_TEXT_TOKENS = 10
    try:
        # boundaries at 4 and 13: first cut lands after index 4 (the
        # last boundary within the first 10-token window), second window
        # 5..14 has the boundary at 13 -> cut at 14, remainder is short
        ids = np.array([a] * 4 + [sp] + [a] * 8 + [sp] + [a] * 3)
        pieces = module._split_long_ids(ids)
        assert [len(p) for p in pieces] == [5, 9, 3]
        assert pieces[0][-1] == sp and pieces[1][-1] == sp
        # no boundaries at all -> hard splits at the limit
        ids2 = np.array([a] * 25)
        pieces2 = module._split_long_ids(ids2)
        assert [len(p) for p in pieces2] == [10, 10, 5]
        # round-trip: concatenation preserves the sequence
        assert np.concatenate(pieces).tolist() == ids.tolist()
    finally:
        module.MAX_TEXT_TOKENS = old


def test_microbatcher_coalesces_concurrent_calls(module):
    """Concurrent same-knob synthesize() calls coalesce into ONE
    synthesize_batch dispatch (VERDICT r4 #7: amortize the fixed
    per-dispatch cost that dominates short utterances); a lone call
    falls through to the single-call path; errors propagate."""
    import threading

    from mb_istft_vits_tpu.serve import MicroBatcher

    texts = ["k o N n i t i w a", "s e k a i", "t e s u t o d e s u",
             "a r i g a t o o"]
    with MicroBatcher(module, max_batch=4, max_wait_ms=200.0) as mb:
        results = {}
        # release all threads at once so they land inside one window
        gate = threading.Barrier(len(texts))

        def call(i):
            gate.wait()
            results[i] = mb.synthesize(texts[i], seed=7)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(texts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == len(texts)
        batched = {t["batched"] for _, t in results.values()}
        assert max(batched) >= 2, batched  # coalescing actually happened
        for i, (audio, t) in results.items():
            assert np.all(np.isfinite(audio)) and len(audio) > 0
        # coalesced rows match the plain batched API bit-for-bit (row
        # order inside the coalesced batch is arrival order — replay it)
        some = next(t for _, t in results.values() if t["batched"] >= 2)
        ref_audios, _ = module.synthesize_batch(some["batch_order"],
                                                seed=7)
        for i, (audio, t) in results.items():
            if t["batched"] >= 2 and texts[i] in some["batch_order"]:
                j = some["batch_order"].index(texts[i])
                np.testing.assert_array_equal(audio, ref_audios[j])

        # lone call: single-call path, batched == 1
        a1, t1 = mb.synthesize(texts[0], seed=9)
        assert t1["batched"] == 1 and len(a1) > 0
