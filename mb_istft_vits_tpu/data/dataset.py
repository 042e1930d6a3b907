"""Dataset + bucketed batcher.

Behavior contract: reference `data_utils.py` —
  - filelist rows `path|text` (single speaker) or `path|sid|text`
    (TextAudioLoader / TextAudioSpeakerLoader, data_utils.py:15,159)
  - text length filter [min_text_len, max_text_len] (data_utils.py:39-40)
  - wav → linear spectrogram with a disk cache next to the wav
    (data_utils.py:78-86; `.spec.npy` here instead of `.spec.pt`)
  - optional blank interspersal (data_utils.py:89-98)
  - length-bucketed, epoch-seeded, rank-strided batching
    (DistributedBucketSampler, data_utils.py:308-404)

TPU-first change: batches are padded to *static* shapes — text to a fixed
cap, spec frames to the bucket's upper boundary — so XLA compiles one train
program per bucket instead of one per shape (SURVEY.md §5.7).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from mb_istft_vits_tpu.config import DataConfig
from mb_istft_vits_tpu.text import (
    cleaned_text_to_sequence,
    get_module,
    intersperse,
    text_to_sequence,
)


def load_filepaths_and_text(filename: str, split: str = "|",
                            min_cols: int = 2) -> List[List[str]]:
    """reference utils.py:144-147, hardened: blank and under-columned
    lines are skipped with a warning instead of crashing later with an
    IndexError mid-training (e.g. at the first eval)."""
    rows: List[List[str]] = []
    skipped = 0
    with open(filename, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = line.split(split)
            if len(row) < min_cols:
                skipped += 1
                continue
            rows.append(row)
    if skipped:
        import logging

        logging.getLogger(__name__).warning(
            "%s: skipped %d malformed line(s) (fewer than %d '|' columns)",
            filename, skipped, min_cols,
        )
    return rows


def load_wav(full_path: str) -> Tuple[np.ndarray, int]:
    """reference utils.load_wav_to_torch (utils.py:139-141).

    Fast path: the native C++ reader (GIL-free, native/audio.cpp); falls
    back to scipy for containers it doesn't handle."""
    from mb_istft_vits_tpu.data import native_audio

    r = native_audio.load_wav(full_path)
    if r is not None:
        return r
    from scipy.io.wavfile import read

    sampling_rate, data = read(full_path)
    return data.astype(np.float32), sampling_rate


def _spectrogram_host(audio_norm: np.ndarray, n_fft: int, hop: int,
                      win: int) -> np.ndarray:
    """Host-side linear spectrogram [frames, bins] for the data loader —
    native C++/OpenMP FFT when possible, numpy otherwise. Keeps the data
    path off the accelerator (the reference's loader likewise runs on CPU
    DataLoader workers, train_latest.py:85)."""
    from mb_istft_vits_tpu.data import native_audio

    spec = native_audio.spectrogram(audio_norm, n_fft, hop, win)
    if spec is not None:
        return spec
    p = (n_fft - hop) // 2
    y = np.pad(audio_norm, (p, p))
    frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]
    window = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win) / win))
    if win < n_fft:
        left = (n_fft - win) // 2
        window = np.pad(window, (left, n_fft - win - left))
    return np.abs(
        np.fft.rfft(y[idx] * window[None, :], axis=-1)
    ).astype(np.float32)


class TextAudioDataset:
    """Loads (text_ids, spec, wav[, sid]) tuples.

    device_spec=True is the TPU-first feeding mode: the host ships ONLY
    int16 PCM (the wav's native encoding — lossless) and the linear
    spectrogram is computed inside the train programs on the MXU
    (train/step.py), cutting H2D feed bytes ~6× (no [B, F, 513] f32
    spec transfer, wav at half width). The reference's host-side
    `.spec.pt`-cache pipeline (data_utils.py:78-86) remains the
    device_spec=False path."""

    def __init__(self, filelist: str, cfg: DataConfig, seed: int = 1234,
                 text_id_cap: Optional[int] = None,
                 device_spec: bool = False):
        self.device_spec = device_spec
        self.cfg = cfg
        self.multi_speaker = cfg.n_speakers > 0
        rows = load_filepaths_and_text(
            filelist, min_cols=3 if self.multi_speaker else 2)
        rng = np.random.RandomState(seed)
        rng.shuffle(rows)
        # the batcher pads text to this static cap; a sample whose
        # *expanded* ids exceed it must be dropped here, NOT silently
        # truncated at batch time (truncated text against full audio
        # corrupts MAS/duration training for that sample)
        if text_id_cap is None:
            text_id_cap = cfg.max_text_len * (2 if cfg.add_blank else 1) + 1
        self.text_id_cap = text_id_cap
        self.rows: List[List[str]] = []
        self.lengths: List[int] = []
        self._ids: List[np.ndarray] = []  # precomputed (cached) text ids
        dropped_long = 0
        for row in rows:
            text = row[2] if self.multi_speaker else row[1]
            if not (cfg.min_text_len <= len(text) <= cfg.max_text_len):
                continue
            ids = self.get_text(text)
            if len(ids) > text_id_cap:
                dropped_long += 1
                continue
            self.rows.append(row)
            self._ids.append(ids)
            # spec-frame estimate from file size (data_utils.py:60)
            try:
                n = os.path.getsize(row[0]) // (2 * cfg.hop_length)
            except OSError:
                n = 0
            self.lengths.append(n)
        if dropped_long:
            import logging

            logging.getLogger(__name__).warning(
                "%s: dropped %d sample(s) whose cleaned text expands past "
                "the %d-id static cap", filelist, dropped_long, text_id_cap,
            )

    def __len__(self) -> int:
        return len(self.rows)

    def get_text(self, text: str) -> np.ndarray:
        cfg = self.cfg
        if cfg.cleaned_text:
            ids = cleaned_text_to_sequence(text, cfg.text_module)
        else:
            ids = text_to_sequence(text, cfg.text_cleaners, cfg.text_module)
        if cfg.add_blank:
            ids = intersperse(ids, 0)
        return np.asarray(ids, np.int32)

    def get_audio(self, filename: str) -> Tuple[np.ndarray, np.ndarray]:
        cfg = self.cfg
        audio, sr = load_wav(filename)
        if sr != cfg.sampling_rate:
            raise ValueError(f"{sr} SR doesn't match target "
                             f"{cfg.sampling_rate} SR ({filename})")
        audio_norm = audio / cfg.max_wav_value
        if self.device_spec:
            # spectrogram computed on-device inside the train step; no
            # host FFT, no .spec.npy cache
            return None, audio_norm.astype(np.float32)
        # splitext, not str.replace: replace(".wav", ...) would rewrite a
        # ".wav" occurring in a DIRECTORY name and silently no-op for
        # other extensions (making np.load read the raw audio file)
        spec_filename = os.path.splitext(filename)[0] + ".spec.npy"
        if os.path.exists(spec_filename):
            spec = np.load(spec_filename)
        else:
            spec = _spectrogram_host(
                audio_norm, cfg.filter_length, cfg.hop_length,
                cfg.win_length,
            )  # [F, bins]
            try:
                # atomic write: concurrent loader threads (bucket padding
                # duplicates indices) or a second host on a shared FS must
                # never np.load a half-written cache file; the tmp name
                # must be unique per THREAD too — 8 prefetch workers share
                # one pid, and two of them truncating the same tmp file
                # would publish a half-written cache
                import threading

                tmp = (f"{spec_filename}.tmp."
                       f"{os.getpid()}.{threading.get_ident()}")
                with open(tmp, "wb") as f:
                    np.save(f, spec)
                os.replace(tmp, spec_filename)
            except OSError:
                pass
        return spec.astype(np.float32), audio_norm.astype(np.float32)

    def __getitem__(self, index: int):
        row = self.rows[index]
        if self.multi_speaker:
            path, sid = row[0], row[1]
        else:
            path = row[0]
            sid = None
        ids = self._ids[index]  # precomputed at init (also the length gate)
        spec, wav = self.get_audio(path)
        item = {"x": ids, "wav": wav}
        if spec is not None:
            item["spec"] = spec
        if sid is not None:
            item["sid"] = int(sid)
        return item


class BucketedBatcher:
    """Static-shape, length-bucketed, epoch-seeded, rank-strided batches
    (replaces DistributedBucketSampler, data_utils.py:308-404)."""

    def __init__(
        self,
        dataset: TextAudioDataset,
        batch_size: int,
        boundaries: Sequence[int] = (32, 300, 400, 500, 600, 700, 800, 900,
                                     1000),
        num_replicas: int = 1,
        rank: int = 0,
        shuffle: bool = True,
        max_text_frames: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.boundaries = list(boundaries)
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        # the dataset drops samples whose ids exceed this cap, so padding
        # to it is lossless by construction
        self.text_cap = max_text_frames or dataset.text_id_cap

        self.buckets: List[List[int]] = [
            [] for _ in range(len(self.boundaries) - 1)
        ]
        for i, length in enumerate(dataset.lengths):
            b = self._bisect(length)
            if b != -1:
                self.buckets[b].append(i)
        # drop empty buckets (data_utils.py:335-338)
        for i in range(len(self.buckets) - 1, 0, -1):
            if len(self.buckets[i]) == 0:
                self.buckets.pop(i)
                self.boundaries.pop(i + 1)

    def _bisect(self, x: int) -> int:
        for i in range(len(self.boundaries) - 1):
            if self.boundaries[i] < x <= self.boundaries[i + 1]:
                return i
        return -1

    def __len__(self) -> int:
        total = 0
        tb = self.num_replicas * self.batch_size
        for bucket in self.buckets:
            n = len(bucket)
            n_pad = n + (tb - n % tb) % tb
            total += n_pad // tb
        return total

    def epoch_batches(self, epoch: int) -> List[Tuple[int, List[int]]]:
        """List of (bucket_idx, sample indices) for this rank."""
        g = np.random.RandomState(epoch)
        batches = []
        for bi, bucket in enumerate(self.buckets):
            ids = list(range(len(bucket)))
            if self.shuffle:
                g.shuffle(ids)
            tb = self.num_replicas * self.batch_size
            rem = (tb - len(ids) % tb) % tb
            if rem and len(ids):
                # pad to a total-batch multiple by replicating the id list
                # (reference DistributedBucketSampler, data_utils.py:352)
                ids = ids + ids * (rem // len(ids)) + ids[: rem % len(ids)]
            ids = ids[self.rank :: self.num_replicas]
            for j in range(len(ids) // self.batch_size):
                chunk = ids[j * self.batch_size : (j + 1) * self.batch_size]
                batches.append((bi, [bucket[k] for k in chunk]))
        if self.shuffle:
            order = g.permutation(len(batches))
            batches = [batches[i] for i in order]
        return batches

    def epoch_batches_global(self, epoch: int
                             ) -> List[Tuple[int, List[int]]]:
        """The GLOBAL batch sequence: batch j is every rank's j-th chunk
        concatenated in rank order — rows [r*B:(r+1)*B] are exactly what
        rank r's `epoch_batches(epoch)[j]` holds, matching the row
        placement `shard_batch` gives process-local data under SPMD.
        Every process can compute this identically (the per-rank shuffles
        are epoch-seeded), which is what a multi-host device-resident
        gather needs: one identical index vector per step on all hosts.
        """
        per_rank = []
        for r in range(self.num_replicas):
            view = BucketedBatcher.__new__(BucketedBatcher)
            view.__dict__.update(self.__dict__)
            view.rank = r
            per_rank.append(view.epoch_batches(epoch))
        out = []
        for j in range(len(per_rank[0])):
            bi = per_rank[0][j][0]
            assert all(pr[j][0] == bi for pr in per_rank)
            out.append((bi, [i for pr in per_rank for i in pr[j][1]]))
        return out

    def pad_shape(self, bucket_idx: int) -> Tuple[int, int]:
        """(max text len, max spec frames) — static per bucket."""
        return self.text_cap, self.boundaries[bucket_idx + 1]

    def make_batch(self, bucket_idx: int,
                   indices: List[int]) -> Dict[str, np.ndarray]:
        cfg = self.dataset.cfg
        device_spec = self.dataset.device_spec
        t_x, t_spec = self.pad_shape(bucket_idx)
        t_wav = t_spec * cfg.hop_length
        if device_spec:
            # carry the sub-hop tail + front-end pad so the on-device
            # spectrogram's frames see exactly the samples the host
            # per-utterance STFT would (train/step.py slices the frame
            # count back to t_spec)
            t_wav += cfg.filter_length - cfg.hop_length
        b = len(indices)
        n_bins = cfg.filter_length // 2 + 1

        x = np.zeros((b, t_x), np.int32)
        x_lengths = np.zeros((b,), np.int32)
        spec = (None if device_spec
                else np.zeros((b, t_spec, n_bins), np.float32))
        spec_lengths = np.zeros((b,), np.int32)
        wav = np.zeros((b, t_wav, 1),
                       np.int16 if device_spec else np.float32)
        wav_lengths = np.zeros((b,), np.int32)
        sid = np.zeros((b,), np.int32)

        for i, idx in enumerate(indices):
            item = self.dataset[idx]
            ids, wv = item["x"], item["wav"]
            lx = min(len(ids), t_x)
            lw = min(len(wv), t_wav)
            x[i, :lx] = ids[:lx]
            x_lengths[i] = lx
            if device_spec:
                # int16 PCM transfer: wavs are 16-bit sources, so
                # round-trip through the normalized float is lossless
                wav[i, :lw, 0] = np.clip(
                    np.rint(wv[:lw] * cfg.max_wav_value), -32768, 32767
                ).astype(np.int16)
                spec_lengths[i] = min(lw // cfg.hop_length, t_spec)
            else:
                sp = item["spec"]
                ls = min(sp.shape[0], t_spec)
                spec[i, :ls] = sp[:ls]
                spec_lengths[i] = ls
                wav[i, :lw, 0] = wv[:lw]
            wav_lengths[i] = lw
            if "sid" in item:
                sid[i] = item["sid"]

        batch = {
            "x": x, "x_lengths": x_lengths,
            "spec_lengths": spec_lengths,
            "wav": wav, "wav_lengths": wav_lengths,
        }
        if spec is not None:
            batch["spec"] = spec
        if self.dataset.multi_speaker:
            batch["sid"] = sid
        return batch

    def iter_epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        for bucket_idx, indices in self.epoch_batches(epoch):
            yield self.make_batch(bucket_idx, indices)
