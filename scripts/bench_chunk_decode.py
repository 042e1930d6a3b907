#!/usr/bin/env python
"""Chunked-decode strategies on a long utterance, real TPU, e2e timing.

Compares the pipelined streaming decode (one dispatch per chunk,
one-deep pipeline) against decode_chunks_batched (ALL chunks in one
dispatch) — on a high-RTT dispatch link the batched variant should
approach a single round trip regardless of utterance length.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    module = SynthesisModule(
        "configs/ljs_mb_istft_vits.json",
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    sent = ("ðɪs ɪz ɐ tɛst ʌv ðə mʌltibænd ɪnvɜːs ʃɔːɹt taɪm fʊɹiɐ "
            "tɹænsfɔːɹm sɪstəm fɔːɹ ɛnd tuː ɛnd spiːtʃ sɪnθəsɪs. ")
    text = sent * 3  # ~18 s of audio
    z, y_len, sid = module.prepare_shared_latents(text, seed=0)
    audio_s = y_len * module.hop_length / module.sampling_rate
    print(f"latents: {z.shape} -> {audio_s:.1f}s audio")

    strategies = {
        "streaming_pipelined": lambda: module.synthesize_from_shared_latents(
            z, sid, chunk_frames=256, overlap_frames=16),
        "batched_one_dispatch": lambda: module.decode_chunks_batched(
            z, sid, chunk_frames=256, overlap_frames=16),
        "spec_join_pipelined": lambda: module.decode_spec_join(
            z, sid, chunk_frames=256, overlap_frames=16),
        "spec_join_batched": lambda: module.decode_spec_join(
            z, sid, chunk_frames=256, overlap_frames=16, batched=True),
        "full_decode": lambda: module.infer_z_only(z, sid),
    }
    for name, fn in strategies.items():
        fn()  # warm / compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            wav = fn()
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(f"{name:22s}: {med * 1000:7.1f} ms  "
              f"rtf={med / audio_s:.5f}  n={len(wav)}")


if __name__ == "__main__":
    main()
