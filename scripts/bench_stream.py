#!/usr/bin/env python
"""Streaming decode benchmark: time-to-first-audio and steady-state RTF.

Measures stream_from_latents with the growing-chunk plan (default) vs
fixed 64-frame chunks on a real utterance, e2e over whatever dispatch
link is present. The reference anchor is the chunked-z spec-join decode
at RTF 0.0542 on CPU (inferz_test.ipynb cell 7).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_stream(module, z, sid, audio_s, label, **kw):
    # warm / compile every bucket the plan will touch
    for _ in module.stream_from_latents(z, sid, **kw):
        pass
    ttfa, totals = [], []
    n_chunks = 0
    for _ in range(5):
        t0 = time.perf_counter()
        first = None
        n_chunks = 0
        for chunk in module.stream_from_latents(z, sid, **kw):
            if first is None:
                first = time.perf_counter() - t0
            n_chunks += 1
        totals.append(time.perf_counter() - t0)
        ttfa.append(first)
    ttfa_ms = float(np.median(ttfa)) * 1000
    tot = float(np.median(totals))
    print(f"{label:28s}: TTFA {ttfa_ms:6.1f} ms | total {tot * 1000:7.1f} ms"
          f" | stream RTF {tot / audio_s:.4f} | {n_chunks} chunks")


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
    for reps, tag in ((1, "3.9s"), (3, "12s")):
        z, y_len, sid = module.prepare_shared_latents(sent * reps, seed=0)
        audio_s = y_len * module.hop_length / module.sampling_rate
        print(f"--- utterance ~{audio_s:.1f}s ({z.shape[0]} z-frames) ---")
        run_stream(module, z, sid, audio_s, "fixed 64-frame chunks",
                   grow_chunks=False)
        run_stream(module, z, sid, audio_s, "growing chunks (default)",
                   grow_chunks=True)


if __name__ == "__main__":
    main()
