"""Text frontend and data pipeline tests (host-side, parity with the
reference filelists)."""

import os

import numpy as np
import pytest

from mb_istft_vits_tpu.config import DataConfig
from mb_istft_vits_tpu.data import BucketedBatcher, TextAudioDataset
from mb_istft_vits_tpu.text import (
    cleaned_text_to_sequence,
    get_symbols,
    intersperse,
    text_to_sequence,
)
from mb_istft_vits_tpu.text import en as text_en
from mb_istft_vits_tpu.text import jp as text_jp


def test_en_symbols_match_reference():
    import importlib.util, sys

    spec = importlib.util.spec_from_file_location(
        "ref_en_symbols", "/root/reference/text/symbols.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert text_en.symbols == mod.symbols


def test_jp_symbols_match_reference():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_jp_symbols", "/root/reference/text_JP/symbols.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert text_jp.symbols == mod.symbols


def test_jp_ipa_tables_match_reference():
    """Our IPA tables are DERIVED from the romaji tables via a phone
    rewrite; they must still reproduce the reference's hand-written IPA
    tables byte-for-byte (including the decomposed c+COMBINING CEDILLA),
    reference phonemize.py:3-123."""
    import ast
    import re

    src = open("/root/reference/text_JP/phonemize.py").read()
    fn = src[src.find("def mora2phoneme_text2phoneme"):
             src.find("def mora2phoneme_jpn")]
    d2, d1 = re.findall(r"\{[^{}]*\}", fn, re.S)[:2]
    ref_t2, ref_t1 = ast.literal_eval(d2), ast.literal_eval(d1)

    assert {k: text_jp.IPA_TABLE2[k] for k in ref_t2} == ref_t2
    assert {k: text_jp.IPA_TABLE[k] for k in ref_t1} == ref_t1
    # ours is a strict superset: kana the reference IPA table silently
    # leaves unconverted (ヂ/ヅ/ヲ exist in its romaji table only)
    assert set(text_jp.IPA_TABLE) - set(ref_t1) == {"ヂ", "ヅ", "ヲ"}
    assert set(text_jp.IPA_TABLE2) == set(ref_t2)


def test_jp_mora2ipa_matches_reference_output():
    """End-to-end parity with the reference IPA phonemizer on inputs
    that avoid its documented quirks (word-final sokuon gemination
    across a boundary)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_jp_phonemize", "/root/reference/text_JP/phonemize.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cases = [
        "コンニチハ",
        "キョーハ イーテンキ",
        "ガッコー",  # sokuon geminating within a word
        "マッチャ",
        "ヒャクエン デス",
        "シンブンシ",
        "チョット マッテ",
        "デュエット",
        "ワタシハ ガクセーデス",
    ]
    for text in cases:
        ref = " ".join(mod.mora2phoneme_text2phoneme(text).split())
        ours = " ".join(text_jp.mora2ipa(text).split())
        assert ours == ref, (text, ours, ref)


def test_jp_mora2phoneme():
    # katakana + long vowel + sokuon/hatsuon
    out = text_jp.mora2phoneme("キョート")
    assert out == "ky o: t o"
    # trailing space is reference behavior (rstrip precedes the long-vowel
    # substitution, phonemize.py:268-269); token split drops it
    out2 = text_jp.mora2phoneme("トーキョー")
    assert out2.split() == ["t", "o:", "ky", "o:"]
    out3 = text_jp.mora2phoneme("ニッポン")
    assert out3 == "n i Q p o N"


def test_jp_cleaned_text_roundtrip():
    seq = cleaned_text_to_sequence("k o N n i t i w a", "text_JP")
    assert len(seq) == 9
    assert all(s > 0 for s in seq)


def test_en_cleaned_text():
    seq = cleaned_text_to_sequence("h@lo wurld", "text")
    # '@' not in symbol set -> skipped
    assert len(seq) == len("hlo wurld")


def test_en_basic_cleaners():
    seq = text_to_sequence("Hello,   World!", ["basic_cleaners"], "text")
    sym = get_symbols("text")
    text = "".join(sym[i] for i in seq)
    assert text == "hello, world!"


def test_intersperse():
    assert intersperse([1, 2, 3], 0) == [0, 1, 0, 2, 0, 3, 0]


@pytest.fixture
def wav_dataset(tmp_path, rng):
    """Tiny on-disk dataset with real wav files."""
    from scipy.io.wavfile import write

    paths = []
    for i, n in enumerate([4000, 9000, 14000]):
        wav = (rng.uniform(-0.3, 0.3, n) * 32767).astype(np.int16)
        p = tmp_path / f"utt{i}.wav"
        write(p, 8000, wav)
        paths.append(str(p))
    filelist = tmp_path / "train.txt"
    rows = [f"{paths[0]}|k o N n i t i w a",
            f"{paths[1]}|a i u e o k a k i",
            f"{paths[2]}|t o: ky o: n i i k u"]
    filelist.write_text("\n".join(rows), encoding="utf-8")
    return str(filelist)


def test_dataset_and_batcher(wav_dataset):
    cfg = DataConfig(
        training_files=wav_dataset, sampling_rate=8000, filter_length=256,
        hop_length=64, win_length=256, text_module="text_JP",
        cleaned_text=True, add_blank=True, max_wav_value=32768.0,
    )
    ds = TextAudioDataset(wav_dataset, cfg)
    assert len(ds) == 3
    item = ds[0]
    assert item["x"].dtype == np.int32
    assert item["spec"].shape[1] == 129
    # blank interspersal doubles length + 1
    raw_len = (len(item["x"]) - 1) // 2
    assert len(item["x"]) == raw_len * 2 + 1

    # spec cache created beside wavs
    ds2 = TextAudioDataset(wav_dataset, cfg)
    item2 = ds2[0]
    np.testing.assert_allclose(item["spec"], item2["spec"])

    batcher = BucketedBatcher(ds, batch_size=2,
                              boundaries=[16, 128, 256, 512])
    batches = list(batcher.iter_epoch(0))
    assert len(batches) >= 1
    for b in batches:
        assert b["x"].shape[0] == 2
        assert b["spec"].shape[1] in (128, 256, 512)  # bucket boundaries
        assert b["wav"].shape[1] == b["spec"].shape[1] * 64
        assert np.all(b["spec_lengths"] <= b["spec"].shape[1])

    # epoch-seeded determinism
    b0 = batcher.epoch_batches(3)
    b1 = batcher.epoch_batches(3)
    assert b0 == b1


def test_device_spec_batches(wav_dataset):
    """device_spec=True feeding mode (train.py default): int16 PCM only,
    no host spectrogram / .spec.npy cache; frames computed on-device
    must match the host .spec cache inside spec_lengths."""
    import jax.numpy as jnp

    from mb_istft_vits_tpu.dsp import spectrogram

    cfg = DataConfig(
        training_files=wav_dataset, sampling_rate=8000, filter_length=256,
        hop_length=64, win_length=256, text_module="text_JP",
        cleaned_text=True, add_blank=True, max_wav_value=32768.0,
    )
    ds_h = TextAudioDataset(wav_dataset, cfg)
    ds_d = TextAudioDataset(wav_dataset, cfg, device_spec=True)
    assert "spec" not in ds_d[0]

    bh = next(BucketedBatcher(ds_h, batch_size=2,
                              boundaries=[16, 128, 256, 512],
                              shuffle=False).iter_epoch(0))
    bd = next(BucketedBatcher(ds_d, batch_size=2,
                              boundaries=[16, 128, 256, 512],
                              shuffle=False).iter_epoch(0))

    assert "spec" not in bd
    assert bd["wav"].dtype == np.int16
    pad = cfg.filter_length - cfg.hop_length
    assert bd["wav"].shape[1] == bh["wav"].shape[1] + pad
    np.testing.assert_array_equal(bd["spec_lengths"], bh["spec_lengths"])
    np.testing.assert_array_equal(bd["wav_lengths"], bh["wav_lengths"])

    # int16 dequantization is lossless for 16-bit sources
    deq = bd["wav"].astype(np.float32) / cfg.max_wav_value
    np.testing.assert_array_equal(deq[:, : bh["wav"].shape[1]], bh["wav"])

    # on-device spectrogram (what train/step.py:_prep computes) matches
    # the host .spec cache on every frame inside spec_lengths
    t_spec = (bd["wav"].shape[1] - pad) // cfg.hop_length
    mag = np.asarray(spectrogram(
        jnp.asarray(deq[..., 0]), cfg.filter_length, cfg.hop_length,
        cfg.win_length,
    )).transpose(0, 2, 1)[:, :t_spec]
    for i in range(2):
        n = bh["spec_lengths"][i]
        np.testing.assert_allclose(mag[i, :n], bh["spec"][i, :n],
                                   atol=2e-4)


def test_device_resident_feeder_matches_host_batches(wav_dataset):
    """DeviceResidentFeeder (data/resident.py): every batch gathered
    from the HBM-resident pools must be BIT-identical to the host
    batcher's — same compiled train programs serve both feeding modes.
    Covers epoch shuffling and the duplicate-index padding the batcher
    emits for short buckets."""
    from mb_istft_vits_tpu.data import DeviceResidentFeeder

    cfg = DataConfig(
        training_files=wav_dataset, sampling_rate=8000, filter_length=256,
        hop_length=64, win_length=256, text_module="text_JP",
        cleaned_text=True, add_blank=True, max_wav_value=32768.0,
    )
    ds = TextAudioDataset(wav_dataset, cfg, device_spec=True)
    batcher = BucketedBatcher(ds, batch_size=2,
                              boundaries=[16, 128, 256, 512])
    est = DeviceResidentFeeder.corpus_bytes(batcher)
    feeder = DeviceResidentFeeder(batcher)
    assert est > 0
    for epoch in (0, 1):
        host = list(batcher.iter_epoch(epoch))
        dev = list(feeder.iter_epoch(epoch))
        assert len(host) == len(dev) >= 1
        for bh, bd in zip(host, dev):
            assert set(bh) == set(bd)
            for k in bh:
                got = np.asarray(bd[k])
                assert got.dtype == bh[k].dtype, k
                np.testing.assert_array_equal(got, bh[k], err_msg=k)

    # host-spec datasets are rejected (pools would be f32 spectrograms)
    ds_h = TextAudioDataset(wav_dataset, cfg)
    with pytest.raises(ValueError):
        DeviceResidentFeeder(BucketedBatcher(ds_h, batch_size=2,
                                             boundaries=[16, 128, 256]))


def test_epoch_batches_global_matches_rank_slices(wav_dataset):
    """epoch_batches_global row-blocks must equal each rank's strided
    epoch_batches — the contract that lets every host of a multi-host
    resident feeder compute one identical global index stream."""
    cfg = DataConfig(
        training_files=wav_dataset, sampling_rate=8000, filter_length=256,
        hop_length=64, win_length=256, text_module="text_JP",
        cleaned_text=True, add_blank=True, max_wav_value=32768.0,
    )
    ds = TextAudioDataset(wav_dataset, cfg, device_spec=True)
    R, B = 2, 1
    ranks = [BucketedBatcher(ds, batch_size=B, num_replicas=R, rank=r,
                             boundaries=[16, 128, 256, 512])
             for r in range(R)]
    glob = ranks[0].epoch_batches_global(epoch=5)
    per_rank = [rk.epoch_batches(5) for rk in ranks]
    assert len(glob) == len(per_rank[0]) == len(per_rank[1]) >= 1
    for j, (bi, rows) in enumerate(glob):
        assert len(rows) == R * B
        for r in range(R):
            assert per_rank[r][j][0] == bi
            assert rows[r * B:(r + 1) * B] == per_rank[r][j][1]


def test_device_resident_feeder_dp_mesh(wav_dataset):
    """Multi-device data-parallel mesh: pools are replicated, the gather
    emits batches sharded over 'data' on the batch dim (the layout
    shard_batch hands the train step), contents still bit-identical."""
    import jax

    from mb_istft_vits_tpu.data import DeviceResidentFeeder
    from mb_istft_vits_tpu.parallel import create_mesh

    if jax.device_count() < 2:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = DataConfig(
        training_files=wav_dataset, sampling_rate=8000, filter_length=256,
        hop_length=64, win_length=256, text_module="text_JP",
        cleaned_text=True, add_blank=True, max_wav_value=32768.0,
    )
    ds = TextAudioDataset(wav_dataset, cfg, device_spec=True)
    batcher = BucketedBatcher(ds, batch_size=jax.device_count(),
                              boundaries=[16, 128, 256, 512])
    mesh = create_mesh()
    feeder = DeviceResidentFeeder(batcher, mesh=mesh)
    host = list(batcher.iter_epoch(0))
    dev = list(feeder.iter_epoch(0))
    assert len(host) == len(dev) >= 1
    for bh, bd in zip(host, dev):
        for k in bh:
            arr = bd[k]
            assert "data" in getattr(arr.sharding, "spec", ())[0:1] or \
                arr.sharding.spec[0] == "data", (k, arr.sharding)
            np.testing.assert_array_equal(np.asarray(arr), bh[k],
                                          err_msg=k)


def test_native_audio_loader(wav_dataset, rng):
    """C++ loader (native/audio.cpp): wav parity vs scipy, spectrogram
    parity vs the on-device DSP (reference data_utils.py:78-86 path)."""
    from scipy.io.wavfile import read

    from mb_istft_vits_tpu.data import native_audio

    assert native_audio.available()
    wav_path = open(wav_dataset).readline().split("|")[0]
    y, sr = native_audio.load_wav(wav_path)
    sr_ref, y_ref = read(wav_path)
    assert sr == sr_ref
    np.testing.assert_array_equal(y, y_ref.astype(np.float32))

    import jax.numpy as jnp

    from mb_istft_vits_tpu.dsp import spectrogram

    norm = y / 32768.0
    spec_c = native_audio.spectrogram(norm, 256, 64, 256)
    spec_j = np.asarray(
        spectrogram(jnp.asarray(norm[None]), 256, 64, 256)[0]
    ).T
    assert spec_c.shape == spec_j.shape
    np.testing.assert_allclose(spec_c, spec_j, atol=2e-4)


def test_prefetch_iterator_matches_sync(wav_dataset):
    """Threaded prefetch yields exactly the synchronous epoch batches."""
    from mb_istft_vits_tpu.data import prefetch_epoch

    cfg = DataConfig(
        training_files=wav_dataset, sampling_rate=8000, filter_length=256,
        hop_length=64, win_length=256, text_module="text_JP",
        cleaned_text=True, add_blank=True, max_wav_value=32768.0,
    )
    ds = TextAudioDataset(wav_dataset, cfg)
    batcher = BucketedBatcher(ds, batch_size=2,
                              boundaries=[16, 128, 256, 512])
    sync = list(batcher.iter_epoch(1))
    pre = list(prefetch_epoch(batcher, 1, num_workers=3, prefetch_depth=2))
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_batcher_rank_partition(wav_dataset):
    cfg = DataConfig(
        training_files=wav_dataset, sampling_rate=8000, filter_length=256,
        hop_length=64, win_length=256, text_module="text_JP",
        cleaned_text=True, add_blank=True,
    )
    ds = TextAudioDataset(wav_dataset, cfg)
    all_ids = []
    for rank in range(2):
        b = BucketedBatcher(ds, batch_size=1, num_replicas=2, rank=rank,
                            boundaries=[16, 128, 256, 512], shuffle=False)
        for _, ids in b.epoch_batches(0):
            all_ids.extend(ids)
    # every sample appears (padding may duplicate)
    assert set(all_ids) >= set(range(len(ds))) - set(), all_ids


def test_jp_cleaner_space_becomes_separated_sp_token():
    """Phrase spaces must become a standalone 'sp' pause token. The
    reference glues it to the next phoneme ('sps a'), which the
    space-split ID mapping silently drops — losing the pause AND a
    phoneme (reference phonemize.py:263 + text_JP/__init__.py:22, a
    documented quirk fix here)."""
    from mb_istft_vits_tpu.text import jp

    c = jp.japanese_cleaners("カキクケコ サシスセソ")
    toks = c.split(" ")
    assert toks == ["k", "a", "k", "i", "k", "u", "k", "e", "k", "o",
                    "sp", "s", "a", "s", "i", "s", "u", "s", "e", "s", "o"]
    assert all(t in set(jp.symbols) for t in toks)
    # digraph mora + sokuon still map through the tables
    assert jp.japanese_cleaners("チョット マッテ").split(" ") == [
        "ch", "o", "Q", "t", "o", "sp", "m", "a", "Q", "t", "e"]


def test_jp_ipa_phonemizer_variant():
    """The IPA mora variant (reference phonemize.py:3-136): palatalized
    consonants, compressed ɰᵝ for ワ only, sokuon gemination/glottal
    stop, long-vowel ':', '▁' word boundary."""
    from mb_istft_vits_tpu.text.jp import Phonemizer, mora2ipa

    assert mora2ipa("コンニチハ") == "k o ɴ n i t ɕ i h a"
    assert mora2ipa("シンブン") == "ɕ i ɴ b ɯ ɴ"
    assert mora2ipa("チョット マッテ") == "t ɕ o t: o ▁ m a t: e"
    assert mora2ipa("ツクエ") == "t s ɯ k ɯ e"
    # ç is DECOMPOSED c+U+0327, matching the reference table bytes
    assert mora2ipa("フジ ヒカリ") == "ɸ ɯ d ʑ i ▁ ç i k a ɾ i"
    assert mora2ipa("ワタシ") == "ɰᵝ a t a ɕ i"
    assert mora2ipa("ガッコー") == "g a k: o:"
    # romaji-colliding morae keep their plain consonants
    assert mora2ipa("ティーダ スィート") == "t i: d a ▁ s i: t o"
    # ッ before a vowel / at the end -> glottal stop
    assert mora2ipa("アッ") == "a ʔ"
    # the two Phonemizer backends (reference phonemize.py:273-279)
    assert Phonemizer("ipa")("シャシン") == "ɕ a ɕ i ɴ"
    assert Phonemizer()("シャシン") == "sy a s i N"


def test_jp_ipa_sokuon_at_word_boundary():
    """Word-final ッ must become a glottal stop, not geminate across the
    '▁' word boundary or survive as a raw katakana token."""
    from mb_istft_vits_tpu.text.jp import mora2ipa

    assert mora2ipa("アッ カキ") == "a ʔ ▁ k a k i"
    assert mora2ipa("アッ アオイ") == "a ʔ ▁ a o i"
    assert "ッ" not in mora2ipa("アッ カキ")


def test_jp_reference_compat_tokenization():
    """reference_compat=True reproduces the reference's exact (buggy)
    space handling for checkpoints trained with the reference frontend."""
    from mb_istft_vits_tpu.text.jp import mora2phoneme

    ref = mora2phoneme("カキ クケ", reference_compat=True)
    fixed = mora2phoneme("カキ クケ")
    assert fixed == "k a k i sp k u k e"
    # the reference glues the pause marker to the next consonant ('spk'),
    # which the space-split ID mapping then drops
    assert ref.split(" ") == ["k", "a", "k", "i", "spk", "u", "k", "e"]


def test_jp_reference_compat_drops_wo():
    """ヲ exists only in the reference symbols.py table; its runtime
    mora2phoneme table lacks it, so compat mode must leave ヲ untouched
    (the glued token is then dropped at ID mapping, exactly like the
    reference) while the fixed mode maps it to 'o'."""
    from mb_istft_vits_tpu.text.jp import cleaned_text_to_sequence, mora2phoneme

    assert mora2phoneme("ホンヲヨム") == "h o N o y o m u"
    ref = mora2phoneme("ホンヲヨム", reference_compat=True)
    assert "ヲ" in ref  # survives as a glued token...
    ids_ref = cleaned_text_to_sequence(ref)
    ids_fixed = cleaned_text_to_sequence(mora2phoneme("ホンヲヨム"))
    # ...and the glued 'ヲy' token is dropped at ID mapping, losing BOTH
    # the ヲ vowel and the following consonant (reference behavior)
    assert len(ids_fixed) == 8 and len(ids_ref) == 6


def test_jp_cleaners_revised_raw_text(monkeypatch):
    """The serving pipeline's raw-Japanese cleaner (reference
    synthesis_module.py:34-64): placeholder/punctuation splitting,
    kana conversion via pyopenjtalk (faked here), ヲ→オ, sp pauses."""
    import sys
    import types

    fake = types.ModuleType("pyopenjtalk")
    KANA = {"本": "ホン", "を": "ヲ", "読む": "ヨム", "こんにちは": "コンニチハ"}

    def g2p(text, kana=False):
        assert kana is True
        out = "".join(KANA.get(ch, "") for ch in text) or \
            "".join(KANA.get(text, text))
        return KANA.get(text, out)

    fake.g2p = g2p
    monkeypatch.setitem(sys.modules, "pyopenjtalk", fake)

    from mb_istft_vits_tpu.text.jp import japanese_cleaners_revised

    # punctuation becomes a separated sp pause; kanji goes through kana
    out = japanese_cleaners_revised("こんにちは、本")
    assert out == "k o N n i t i h a sp h o N"
    # ヲ→オ before the mora tables (mirrors the reference cleaner)
    assert japanese_cleaners_revised("を") == "o"
    # placeholders survive as bracketed/explicit tokens
    assert japanese_cleaners_revised("{cough}こんにちは") == \
        "<cough> k o N n i t i h a"
    out = japanese_cleaners_revised("[こんにちは]")
    assert out.startswith("[ ") and out.endswith(" ]")
