#!/usr/bin/env python
"""Batched offline synthesis throughput (the production serving path:
one compiled program, many utterances; shards over chips when mesh>1).

Honest timing: jax.device_get is the only sync point on the axon
platform (block_until_ready does not wait there)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


SENTENCES = [
    "ðɪs ɪz ɐ tɛst ʌv ðə mʌltibænd ɪnvɜːs ʃɔːɹt taɪm fʊɹiɐ tɹænsfɔːɹm.",
    "ə kwɪk bɹaʊn fɑks dʒʌmps oʊvɚ ðə leɪzi dɔɡ wɪθ ɡɹeɪt spiːd tədeɪ.",
    "spiːtʃ sɪnθəsɪs ɒn tɛnsɚ pɹəʊsɛsɪŋ juːnɪts ɪz ɹɪmɑːɹkəbli fæst.",
    "ðə wɛðɚ ɪn ðə maʊntənz tʊk ən ʌnɪkspɛktəd tɜːn ðɪs ɑːftɚnuːn.",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/ljs_mb_istft_vits.json")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--reps", type=int, default=5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    module = SynthesisModule(
        args.config,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    texts = [SENTENCES[i % len(SENTENCES)] for i in range(args.batch)]

    # warmup/compile
    module.synthesize_batch(texts, seed=0)

    # audio_seconds from the timed reps themselves (output lengths can
    # vary per seed when use_sdp samples durations)
    times, rep_audio = [], []
    for r in range(args.reps):
        t0 = time.perf_counter()
        audios, _ = module.synthesize_batch(texts, seed=r)
        times.append(time.perf_counter() - t0)
        rep_audio.append(sum(len(a) for a in audios) / module.sampling_rate)
    dt = float(np.median(times))
    audio_seconds = float(np.median(rep_audio))
    print(f"batch {args.batch}: {dt*1e3:.1f} ms/batch  "
          f"{args.batch/dt:.1f} utt/s  "
          f"{audio_seconds/dt:.0f} audio-seconds synthesized/sec  "
          f"(batch RTF {dt/audio_seconds:.5f})")


if __name__ == "__main__":
    main()
