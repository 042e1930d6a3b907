#!/usr/bin/env python
"""Short-utterance serving benchmark: single-call vs micro-batched.

The r4 length sweep showed the 0.36 s utterance misses the RTF < 0.01
north star even device-only (0.0137): fixed per-dispatch cost dominates
short calls. MicroBatcher coalesces concurrent short calls into one
batched dispatch; this bench quantifies what that buys on hardware.

Scenario: N concurrent clients each synthesizing a short (~0.4 s)
utterance. Reported per-utterance effective RTF = wall-clock of the
whole wave / total audio seconds produced; plus the single-call
baseline on the same text and the device-only share.

Usage: python scripts/bench_microbatch.py [--clients 8] [--rounds 10]
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ljs_mb_istft_vits.json")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--text", default="həlˈoʊ wɜːld.")
    args = ap.parse_args()

    import jax.numpy as jnp

    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule
    from mb_istft_vits_tpu.serve import MicroBatcher

    module = SynthesisModule(args.config, compute_dtype=jnp.bfloat16)

    # distinct texts defeat the ids/device-buffer caches' would-be
    # single-text shortcut and mimic real traffic (all land in the same
    # text/frame buckets, so compiles are shared)
    texts = [args.text if i == 0 else f"həlˈoʊ wɜːld nˈʌmbɚ {i}."
             for i in range(args.clients)]

    # warm compiles: single path + batch path at the client count
    a, t1 = module.synthesize(texts[0], seed=0)
    module.synthesize_batch(texts, seed=0)

    # --- single-call baseline (sequential, the dialogue-turn status quo)
    singles = []
    for r in range(args.rounds):
        t0 = time.perf_counter()
        audio, tt = module.synthesize(texts[r % args.clients], seed=0)
        singles.append((time.perf_counter() - t0)
                       / max(tt["audio_seconds"], 1e-9))
    single_rtf = float(np.median(singles))

    # --- micro-batched concurrent clients
    waves = []
    with MicroBatcher(module, max_batch=args.clients,
                      max_wait_ms=8.0) as mb:
        # one warm round through the batcher
        mb.synthesize(texts[0], seed=0)
        for r in range(args.rounds):
            results = {}
            gate = threading.Barrier(args.clients)

            def call(i):
                gate.wait()
                results[i] = mb.synthesize(texts[i], seed=0)

            threads = [threading.Thread(target=call, args=(i,))
                       for i in range(args.clients)]
            t0 = time.perf_counter()
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            wall = time.perf_counter() - t0
            total_audio = sum(len(a2) for a2, _ in results.values()) \
                / module.sampling_rate
            batched = max(t2["batched"] for _, t2 in results.values())
            waves.append({"wall_s": wall, "audio_s": total_audio,
                          "rtf": wall / max(total_audio, 1e-9),
                          "batched": batched})

    eff = sorted(w["rtf"] for w in waves)
    out = {
        "metric": "short_utterance_serving",
        "clients": args.clients,
        "utterance_audio_s": round(float(t1["audio_seconds"]), 3),
        "single_call_rtf_e2e": round(single_rtf, 6),
        "microbatch_rtf_e2e": round(float(eff[len(eff) // 2]), 6),
        "speedup": round(single_rtf / max(eff[len(eff) // 2], 1e-9), 2),
        "coalesced": int(np.median([w["batched"] for w in waves])),
        "waves": waves[:3],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
