"""Device-resident dataset feeding: the whole corpus lives in HBM.

The r2/r3 measurements showed host-fed training over a narrow dispatch
link is BANDWIDTH-bound: double-buffering (`prefetch.device_prefetch`)
hides transfer latency but cannot exceed the link's bytes/s, and a
22.05 kHz batch-32 corpus step ships ~10 MB of PCM — at tunnel
bandwidth that caps the step rate far below the device's compute-bound
rate (r4 measurement: ~3 steps/s host-fed vs ~15 steps/s
device-resident on the flagship).

TPU-first fix: a typical TTS corpus in int16 PCM is small (LJSpeech
~24 h at 22.05 kHz is ~3.5 GB) while a TPU v5e has 16 GB of HBM — so
upload the ENTIRE bucket-padded corpus once at startup and assemble
each step's batch on-device with a jitted gather. Per step the host
ships a [batch]-int32 index vector (~128 B) instead of ~10 MB of audio.
Batches produced this way are BIT-IDENTICAL in shape/dtype/content to
the host batcher's (`BucketedBatcher.make_batch`), so the same compiled
train programs (and their AOT cache) serve both feeding modes.

The reference has no analog: its DataLoader(num_workers=8) pipeline
(train_latest.py:85) re-ships every batch over PCIe each step.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mb_istft_vits_tpu.data.dataset import BucketedBatcher


class DeviceResidentFeeder:
    """Upload per-bucket corpus pools to device; gather batches by index.

    Requires the dataset's ``device_spec`` feeding mode (int16 PCM only
    — the f32 host-spec mode would triple the pool bytes for no reason).
    Pool rows are padded exactly like `make_batch` pads batch rows, so
    `gather(bucket, indices)` reproduces the host batch bit-for-bit.
    Works single-device, on DP meshes, and multi-host (pools replicated
    per host, one global index stream — see `iter_epoch`).
    """

    def __init__(self, batcher: BucketedBatcher, mesh=None, logger=None):
        import jax

        if not batcher.dataset.device_spec:
            raise ValueError(
                "DeviceResidentFeeder requires device_spec feeding "
                "(int16 PCM pools; host-spec f32 pools would be 3x the "
                "bytes)")
        self._multihost = jax.process_count() > 1
        if self._multihost and mesh is None:
            raise ValueError(
                "multi-host DeviceResidentFeeder needs the global mesh")
        self.batcher = batcher
        # dataset index -> row within its bucket's pool
        self._row_of = np.full(len(batcher.dataset), -1, np.int64)
        self._pools: List[Dict[str, "jax.Array"]] = []
        pool_sharding = None
        put = jax.device_put
        gather_kw = {}
        if mesh is not None and mesh.size > 1:
            # pools replicated across the mesh; the gather emits batches
            # sharded over 'data' on the batch dim — exactly the layout
            # shard_batch hands the train step, so the same SPMD
            # programs consume either feeding mode. Multi-host: every
            # process uploads the same full pools (replicated arrays are
            # built from identical per-process data) and gathers with an
            # identical global index vector (epoch_batches_global), so
            # each host's devices read their batch rows from local HBM —
            # no input bytes ever cross hosts.
            from mb_istft_vits_tpu.parallel import (
                batch_sharding,
                replicated_sharding,
            )

            pool_sharding = replicated_sharding(mesh)
            gather_kw["out_shardings"] = batch_sharding(mesh, "data")
            if self._multihost:
                def put(v, s=None):
                    return jax.make_array_from_process_local_data(
                        pool_sharding, v)
        self._gather = jax.jit(
            lambda pool, idx: {k: v[idx] for k, v in pool.items()},
            donate_argnums=(),
            **gather_kw,
        )
        nbytes = 0
        for bi, bucket in enumerate(batcher.buckets):
            pool = self._build_pool(bi, bucket)
            nbytes += sum(a.nbytes for a in pool.values())
            if pool_sharding is not None:
                pool = {k: put(v, pool_sharding) for k, v in pool.items()}
            else:
                pool = {k: put(v) for k, v in pool.items()}
            self._pools.append(pool)
        # block until the upload lands so training doesn't race the copy
        jax.block_until_ready([a for p in self._pools for a in p.values()])
        if logger is not None:
            logger.info(
                "device-resident corpus: %d pools, %.2f GB in HBM "
                "(%d utterances)", len(self._pools), nbytes / 1e9,
                int((self._row_of >= 0).sum()))

    def _build_pool(self, bucket_idx: int,
                    indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """One padded row per utterance at the bucket's static shape —
        the same layout `make_batch` gives a batch row."""
        b = self.batcher
        cfg = b.dataset.cfg
        t_x, t_spec = b.pad_shape(bucket_idx)
        t_wav = t_spec * cfg.hop_length + cfg.filter_length - cfg.hop_length
        n = len(indices)
        pool = {
            "x": np.zeros((n, t_x), np.int32),
            "x_lengths": np.zeros((n,), np.int32),
            "spec_lengths": np.zeros((n,), np.int32),
            "wav": np.zeros((n, t_wav, 1), np.int16),
            "wav_lengths": np.zeros((n,), np.int32),
        }
        if b.dataset.multi_speaker:
            pool["sid"] = np.zeros((n,), np.int32)
        for row, idx in enumerate(indices):
            item = b.dataset[idx]
            ids, wv = item["x"], item["wav"]
            lx = min(len(ids), t_x)
            lw = min(len(wv), t_wav)
            pool["x"][row, :lx] = ids[:lx]
            pool["x_lengths"][row] = lx
            pool["wav"][row, :lw, 0] = np.clip(
                np.rint(wv[:lw] * cfg.max_wav_value), -32768, 32767
            ).astype(np.int16)
            pool["spec_lengths"][row] = min(lw // cfg.hop_length, t_spec)
            pool["wav_lengths"][row] = lw
            if "sid" in item:
                pool["sid"][row] = item["sid"]
            self._row_of[idx] = row
        return pool

    def gather(self, bucket_idx: int, indices: Sequence[int]):
        """Assemble the batch for `indices` (dataset indices, as yielded
        by `epoch_batches`) on-device. Only the index vector crosses
        host->device."""
        rows = self._row_of[np.asarray(indices, np.int64)]
        assert (rows >= 0).all(), "index not in any bucket pool"
        return self._gather(self._pools[bucket_idx],
                            rows.astype(np.int32))

    def iter_epoch(self, epoch: int):
        """Device-resident analog of `BucketedBatcher.iter_epoch`.

        Multi-host: every process iterates the identical GLOBAL batch
        sequence (epoch_batches_global) — the jitted gather is one SPMD
        program all hosts enter with the same index vector, and each
        host's output shard holds exactly the rows its rank's
        `epoch_batches` slice would have fed via shard_batch."""
        plan = (self.batcher.epoch_batches_global(epoch)
                if self._multihost else self.batcher.epoch_batches(epoch))
        for bucket_idx, indices in plan:
            yield self.gather(bucket_idx, indices)

    @staticmethod
    def corpus_bytes(batcher: BucketedBatcher) -> int:
        """Predicted pool footprint (before upload) — lets the trainer
        decide whether the corpus fits HBM."""
        cfg = batcher.dataset.cfg
        total = 0
        for bi, bucket in enumerate(batcher.buckets):
            t_x, t_spec = batcher.pad_shape(bi)
            t_wav = (t_spec * cfg.hop_length
                     + cfg.filter_length - cfg.hop_length)
            total += len(bucket) * (t_wav * 2 + t_x * 4 + 16)
        return total
