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
    ap.add_argument("--floor", action="store_true",
                    help="also break the SHORT-utterance device cost "
                         "down op-by-op (probe / latents / decode / "
                         "full programs at the short bucket, repeat-"
                         "dispatch timed, RTT-corrected) — quantifies "
                         "the fixed per-dispatch floor the micro-batch "
                         "amortizes")
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

    floor = None
    if args.floor:
        import jax

        ids = module.text_to_ids(texts[0])
        x, xl = module._pad_ids_cached(ids)
        sid = module._sid(None)
        ns = module._dev_scalar(0.667)
        ls = module._dev_scalar(1.0)
        nsw = module._dev_scalar(0.8)
        rng = jax.random.PRNGKey(0)
        secs = float(t1["audio_seconds"])
        bucket = int(t1["frame_bucket"])

        # measure tunnel RTT once: empty-fetch of a tiny resident array
        tiny = module._dev_scalar(0.0)
        rtts = []
        for _ in range(10):
            t0 = time.perf_counter()
            jax.device_get(tiny)
            rtts.append(time.perf_counter() - t0)
        rtt = float(np.median(rtts))

        def dev_ms(launch, k=20, reps=3):
            """Repeat-dispatch k programs, one sync; device executes the
            queue serially so drain/k = device time per program."""
            out = launch()
            leaves = [a for a in jax.tree.leaves(out)
                      if hasattr(a, "dtype")]
            jax.device_get(leaves[-1].ravel()[:1])
            best = []
            for _ in range(reps):
                t0 = time.perf_counter()
                for _ in range(k):
                    out = launch()
                leaves = [a for a in jax.tree.leaves(out)
                          if hasattr(a, "dtype")]
                jax.device_get(leaves[-1].ravel()[:1])
                best.append(max(time.perf_counter() - t0 - rtt, 0.0)
                            / k * 1e3)
            return round(float(np.median(best)), 3)

        full_fn = module._infer_jit(bucket)
        lat_fn = module._latents_jit(bucket)
        dec_fn = module._decode_jit(bucket)
        z0 = jax.numpy.zeros((1, bucket, module.cfg.inter_channels),
                             module.compute_dtype)
        probe_ms = dev_ms(lambda: module._probe_jit_call(
            x, xl, sid, ls, nsw, rng))
        latents_ms = dev_ms(lambda: lat_fn(module.params, x, xl, sid, ns,
                                           ls, nsw, rng))
        decode_ms = dev_ms(lambda: dec_fn(module.params, z0, sid))
        full_ms = dev_ms(lambda: full_fn(module.params, x, xl, sid, ns,
                                         ls, nsw, rng))
        floor = {
            "audio_s": round(secs, 3),
            "frame_bucket": bucket,
            "rtt_ms": round(rtt * 1e3, 2),
            "probe_enc_dp_ms": probe_ms,
            "latents_ms": latents_ms,
            "align_flow_ms": round(max(latents_ms - probe_ms, 0.0), 3),
            "decode_ms": decode_ms,
            "full_infer_ms": full_ms,
            "rtf_device_full": round(full_ms / 1e3 / secs, 5),
        }

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
    if floor is not None:
        out["short_floor"] = floor
    print(json.dumps(out))


if __name__ == "__main__":
    main()
