"""Threaded batch prefetcher — the reference's `DataLoader(num_workers=8,
pin_memory=True)` equivalent (train_latest.py:85).

Workers assemble batches (wav read + spectrogram + pad) in parallel with
the accelerator step; the hot loader calls are GIL-free C (native/audio.cpp
via ctypes) or numpy, so threads give true overlap without the process
boundary torch needs. An in-order bounded window keeps at most
`prefetch_depth` batches in flight/buffered, bounding host memory the way
pinned-buffer DataLoaders do.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from mb_istft_vits_tpu.data.dataset import BucketedBatcher


class PrefetchIterator:
    """Iterate batches of one epoch with worker-thread prefetch, preserving
    the batcher's epoch-seeded order."""

    def __init__(self, batcher: BucketedBatcher, epoch: int,
                 num_workers: int = 8, prefetch_depth: Optional[int] = None):
        self._batcher = batcher
        self._plan: List[Tuple[int, List[int]]] = batcher.epoch_batches(epoch)
        self._num_workers = num_workers
        # default the in-flight window to the worker count — a
        # smaller depth would leave workers idle and halve the
        # advertised DataLoader(num_workers=8) parallelism
        self._depth = max(1, prefetch_depth or num_workers)

    def __len__(self) -> int:
        return len(self._plan)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # pool per iteration, not per instance: an early `break` out of
        # the batch loop (max-steps cutoff, preemption) shuts this
        # pool down via the generator's finally, and a later
        # re-iteration must get a fresh one instead of 'cannot schedule
        # new futures after shutdown'
        pool = ThreadPoolExecutor(max_workers=self._num_workers,
                                  thread_name_prefix="loader")
        futures = []
        submitted = 0
        try:
            while submitted < len(self._plan) and len(futures) < self._depth:
                bi, idx = self._plan[submitted]
                futures.append(pool.submit(self._batcher.make_batch,
                                           bi, idx))
                submitted += 1
            for i in range(len(self._plan)):
                batch = futures.pop(0).result()
                if submitted < len(self._plan):
                    bi, idx = self._plan[submitted]
                    futures.append(pool.submit(
                        self._batcher.make_batch, bi, idx))
                    submitted += 1
                yield batch
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


def prefetch_epoch(batcher: BucketedBatcher, epoch: int,
                   num_workers: int = 8,
                   prefetch_depth: Optional[int] = None) -> PrefetchIterator:
    """Reference DataLoader stand-in: iterate epoch batches with
    `num_workers` loader threads and a bounded prefetch window."""
    return PrefetchIterator(batcher, epoch, num_workers, prefetch_depth)


def device_prefetch(batches, put, depth: int = 2):
    """Double-buffer H2D transfer against the device step.

    Wraps a host-batch iterator so that while the train step runs on
    batch i, batches i+1..i+depth are already being `put` (device_put /
    shard_batch — an ASYNC enqueue in JAX) onto the device. Without
    this, train.py paid the full H2D transfer serially between steps:
    the realistic host-fed step was ~2.2× the device-resident step on
    the tunnel runtime (BENCH_NOTES r2 'device-spec feeding';
    VERDICT.md r2 next #7). The torch reference gets the same overlap
    from DataLoader pin_memory + CUDA async copies
    (train_latest.py:85,155-161).

    depth=2 keeps at most two batches resident ahead of the consumer —
    a bounded window like pinned-buffer DataLoaders (int16 device-spec
    batches are ~7 MB at the flagship shape, so the HBM cost is noise).

    The put runs on a dedicated thread: on remote-dispatch runtimes
    `jax.device_put` BLOCKS the calling thread on host-side
    serialization + transfer RTT, so an in-line lookahead would still
    serialize feed and compute; a worker thread releases the GIL during
    the transfer wait and genuinely overlaps it with the main thread's
    step dispatch.
    """
    pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="h2d")
    buf: collections.deque = collections.deque()
    it = iter(batches)
    try:
        for _ in range(max(1, depth)):
            try:
                buf.append(pool.submit(put, next(it)))
            except StopIteration:
                break
        while buf:
            nxt = buf.popleft().result()
            try:
                buf.append(pool.submit(put, next(it)))
            except StopIteration:
                pass
            yield nxt
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
