"""Tokenizer oracle over the vendored reference filelists.

The reference ships 24 filelists (`/root/reference/filelists/`), including
pre-phonemized `.cleaned` rows — the actual corpus text its trainers consume
(`/root/reference/data_utils.py:39-40,89-98`). These vendored copies (byte
identical, data) pin the full data contract: every row of every file is
parsed and the `.cleaned` / phoneme rows are tokenized through
`frontend_ids` and checked against the reference's own symbol tables,
loaded live from `/root/reference`.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from mb_istft_vits_tpu.data.dataset import load_filepaths_and_text
from mb_istft_vits_tpu.text import frontend_ids, get_symbols

FILELIST_DIR = os.path.join(os.path.dirname(__file__), "..", "filelists")
REF_DIR = "/root/reference/filelists"

# path|sid|text lists (TextAudioSpeakerLoader, reference data_utils.py:159);
# everything else is path|text (TextAudioLoader, data_utils.py:15).
SID_LISTS = {
    "csj_uudb_test.txt",
    "csj_uudb_test_fine.txt",
    "csj_uudb_train_fine.txt",
    "csj_val_vits_ms.txt",
    "csj_val_vits_ms.txt.bak",
    "csj_val_vits_ms.txt.orig",
    "uudb_audio_sid_text_test_filelist.txt",
    "uudb_audio_sid_text_train_filelist.txt",
    "vctk_audio_sid_text_test_filelist.txt",
    "vctk_audio_sid_text_test_filelist.txt.cleaned",
    "vctk_audio_sid_text_train_filelist.txt",
    "vctk_audio_sid_text_train_filelist.txt.cleaned",
    "vctk_audio_sid_text_val_filelist.txt",
    "vctk_audio_sid_text_val_filelist.txt.cleaned",
}

EN_CLEANED = [
    "ljs_audio_text_train_filelist.txt.cleaned",
    "ljs_audio_text_val_filelist.txt.cleaned",
    "ljs_audio_text_test_filelist.txt.cleaned",
    "vctk_audio_sid_text_train_filelist.txt.cleaned",
    "vctk_audio_sid_text_val_filelist.txt.cleaned",
    "vctk_audio_sid_text_test_filelist.txt.cleaned",
]

# JP lists ship phoneme rows directly (space-separated mora-phonemes with
# `sp` pauses and `<cough>`/bracket placeholders — text_JP/cleaners_v2.py).
JP_LISTS = [
    "uudb_audio_sid_text_train_filelist.txt",
    "uudb_audio_sid_text_test_filelist.txt",
    "uudb_audio_text_train_filelist.txt",
    "uudb_audio_text_test_filelist.txt",
    "uudb_audio_text_train_spk8.txt",
    "uudb_audio_text_test_spk8.txt",
    "csj_uudb_test.txt",
    "csj_uudb_test_fine.txt",
    "csj_uudb_train_fine.txt",
    "csj_val_vits_ms.txt",
]

# two UUDB lists are `utt_id<space>phonemes` rows with no pipe and no .wav
# path — not consumable by the reference loader either (data_utils.py:15
# would unpack-fail); vestigial intermediate data, kept byte-identical.
ID_KEYED_LISTS = {
    "uudb_audio_text_train_filelist.txt",
    "uudb_audio_text_test_filelist.txt",
}


def _load_ref_symbols(relpath: str):
    spec = importlib.util.spec_from_file_location(
        "ref_syms_" + relpath.replace("/", "_"),
        os.path.join("/root/reference", relpath),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.symbols


def _rows(name: str):
    path = os.path.join(FILELIST_DIR, name)
    if name in ID_KEYED_LISTS:
        with open(path, encoding="utf-8") as f:
            return [line.rstrip("\n").split(" ", 1) for line in f if line.strip()]
    return load_filepaths_and_text(
        path, min_cols=3 if name in SID_LISTS else 2)


def test_vendored_lists_match_reference_bytes():
    names = sorted(os.listdir(FILELIST_DIR))
    assert names == sorted(os.listdir(REF_DIR))
    assert len(names) == 24
    for name in names:
        with open(os.path.join(FILELIST_DIR, name), "rb") as a, \
                open(os.path.join(REF_DIR, name), "rb") as b:
            assert a.read() == b.read(), name


@pytest.mark.parametrize("name", sorted(os.listdir(REF_DIR)))
def test_every_row_parses(name):
    """Every row of all 24 lists fits the loader contract: a .wav path,
    an integer sid column exactly for the speaker-id lists, non-empty
    text (reference data_utils.py:15,159 row formats)."""
    rows = _rows(name)
    assert rows, name
    ncols = 3 if name in SID_LISTS else 2
    for row in rows:
        assert len(row) == ncols, (name, row)
        if name not in ID_KEYED_LISTS:
            assert row[0].endswith(".wav"), (name, row[0])
        if ncols == 3:
            int(row[1])  # sid parses
        assert row[-1].strip(), (name, row[0])


@pytest.mark.parametrize("name", EN_CLEANED)
def test_en_cleaned_rows_tokenize_against_upstream_table(name):
    """Every pre-phonemized EN row maps 1:1 (zero dropped symbols) against
    the upstream EN/IPA symbol table (reference text/symbols.py), and
    frontend_ids reproduces the reference's cleaned_text_to_sequence +
    intersperse pipeline (text/__init__.py:28-36, data_utils.py:89-98,
    commons.py:24-27) exactly."""
    ref_en = _load_ref_symbols("text/symbols.py")
    assert get_symbols("text") == ref_en
    s2i = {s: i for i, s in enumerate(ref_en)}
    sid_col = name in SID_LISTS
    for row in _rows(name):
        text = row[2] if sid_col else row[1]
        # reference cleaned_text_to_sequence is char-level and UNFILTERED
        # (KeyError on a miss); zero misses proves the vendored rows are
        # fully covered by the symbol table.
        expect = [s2i[ch] for ch in text]
        ids = frontend_ids(text, "text", [], add_blank=True,
                           cleaned_text=True)
        assert len(ids) == 2 * len(expect) + 1
        assert ids[1::2] == expect
        assert all(i == 0 for i in ids[0::2])


def test_reference_as_shipped_crashes_on_its_own_en_lists():
    """The as-shipped reference maps EN cleaned text against the JAPANESE
    symbol table (`/root/reference/text/__init__.py:3` fork quirk) with no
    miss filter — it raises KeyError on the very first LJS row it ships.
    This pins why our EN frontend restores the upstream table instead of
    copying the quirk (mb_istft_vits_tpu/text/__init__.py docstring)."""
    ref_jp = _load_ref_symbols("text_JP/symbols.py")
    s2i = {s: i for i, s in enumerate(ref_jp)}
    row = _rows("ljs_audio_text_train_filelist.txt.cleaned")[0]
    with pytest.raises(KeyError):
        [s2i[ch] for ch in row[1]]


@pytest.mark.parametrize("name", JP_LISTS)
def test_jp_rows_tokenize_against_reference_table(name):
    """Every JP phoneme row, space-split and filtered like the reference
    (text_JP/__init__.py:28-36), matches frontend_ids; the only tokens the
    symbol table drops are the non-verbal placeholders
    <cough>/<breath>/<sigh> (text_JP/cleaners_v2.py:5-34), bare '' from
    double spaces, and 'N:' (a syllabic-nasal long vowel the reference
    symbols.py:47-60 table never generates — long vowels exist only for
    a/i/u/e/o — so both implementations filter it). cleaned_text=True +
    add_blank matches every shipped UUDB/CSJ config's data block."""
    ref_jp = _load_ref_symbols("text_JP/symbols.py")
    assert get_symbols("text_JP") == ref_jp
    s2i = {s: i for i, s in enumerate(ref_jp)}
    sid_col = name in SID_LISTS
    dropped = set()
    for row in _rows(name):
        text = row[2] if sid_col else row[1]
        toks = text.split(" ")
        expect = [s2i[t] for t in toks if t in s2i]
        dropped |= {t for t in toks if t not in s2i}
        ids = frontend_ids(text, "text_JP", [], add_blank=True,
                           cleaned_text=True)
        assert len(ids) == 2 * len(expect) + 1, (name, row[0])
        assert ids[1::2] == expect, (name, row[0])
    assert dropped <= {"<cough>", "<breath>", "<sigh>", "", "N:"}, (
        name, sorted(dropped)[:10])
