#!/usr/bin/env python
"""Headline benchmark: single-utterance synthesis RTF on one TPU chip.

Prints ONE JSON line. The primary metric is the DEVICE-compute RTF
(queue-drain measurement: N back-to-back dispatches, one device_get sync,
divide — amortizes the tunnel round trip). The end-to-end wall-clock RTF
is reported alongside as medians + IQR: in this environment the TPU sits
behind a network tunnel whose per-call RTT varies ±30% between sessions
(BENCH_NOTES.md r1 rows 0.0089/0.0105/0.0184 for identical code), so the
e2e number measures network weather, not the framework; device RTF is the
stable, hardware-meaningful quantity (VERDICT.md round-1 weak #2).

Baseline: the reference's README headline RTF of 0.066 on an Intel i7 CPU
(reference README.md:3; see BASELINE.md). vs_baseline < 1.0 means faster
than the reference; the north-star target is RTF < 0.01 on one TPU v5e.

Flagship model: ljs_mb_istft_vits (the paper's headline config), random
weights (RTF is weight-independent), bf16 compute.
"""

import json
import os
import sys
import time

import numpy as np


def _devices_or_die(timeout_s: float = 480.0):
    """Backend init with a watchdog: a wedged TPU tunnel blocks
    jax.devices() indefinitely (observed: >45 min with no error). Fail
    loudly instead of hanging the caller; no JSON is printed on failure
    so a dead tunnel can never be recorded as a benchmark result."""
    import threading

    import jax

    result = {}

    def _init():
        try:
            result["devices"] = jax.devices()
        except Exception as e:  # pragma: no cover - backend-dependent
            result["error"] = e

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        print(f"bench: backend init did not complete in {timeout_s:.0f}s "
              f"(wedged TPU tunnel?) — aborting", file=sys.stderr)
        import os

        os._exit(1)
    if "error" in result:
        raise result["error"]
    return result["devices"]


def _iqr(vals):
    q1, q3 = np.percentile(vals, [25, 75])
    return float(q3 - q1)


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule

    on_tpu = any(d.platform == "tpu" for d in _devices_or_die())
    module = SynthesisModule(
        "configs/ljs_mb_istft_vits.json",
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )

    # ~the paper-style test sentence, pre-phonemized (IPA, english_cleaners2
    # style), ~6 s of audio at natural speaking rate
    text = ("ðɪs ɪz ɐ tɛst ʌv ðə mʌltibænd ɪnvɜːs ʃɔːɹt taɪm fʊɹiɐ "
            "tɹænsfɔːɹm sɪstəm fɔːɹ ɛnd tuː ɛnd spiːtʃ sɪnθəsɪs, "
            "ɹʌnɪŋ ɒn ə tɛnsɚ pɹəʊsɛsɪŋ juːnɪt.")

    # warmup: compile + let the adaptive frame-bucket estimator converge
    for i in range(3):
        audio, timings = module.synthesize(text, seed=0)
    audio_seconds = timings["audio_seconds"]
    bucket = timings["frame_bucket"]

    # --- e2e wall clock (includes tunnel dispatch + D2H per call) ---
    e2e = []
    split = {"frontend": [], "dispatch": [], "sync": []}
    for i in range(20):
        t0 = time.perf_counter()
        _, t = module.synthesize(text, seed=0)
        e2e.append((time.perf_counter() - t0) / audio_seconds)
        for k in split:
            split[k].append(t[k])

    # --- device compute: drain a queue of N dispatches, sync once ---
    ids = module.text_to_ids(text)
    x, x_lengths = module._pad_ids_cached(ids)
    rng = jax.random.PRNGKey(0)
    fn = module._infer_jit(bucket)
    # the knobs in the same strong-f32 device-scalar form synthesize()
    # uses, so this drains the SAME compiled program (a raw Python float
    # would trace a second, weak-typed variant of the bucket's program)
    ns, ls, nsw = (module._dev_scalar(v) for v in (0.667, 1.0, 0.8))

    def call():
        out, pcm16 = fn(module.params, x, x_lengths, None, ns, ls, nsw,
                        rng)
        return pcm16[0]

    n = 40
    device = []
    tiny = call().ravel()[:1]
    jax.device_get(tiny)  # drain warmup
    # the final sync costs ~1 tunnel RTT; measure and subtract it
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(tiny)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n):
            pcm = call()
        jax.device_get(pcm.ravel()[:1])  # device executes serially; one sync
        device.append(
            max(time.perf_counter() - t0 - rtt, 0.0) / n / audio_seconds)

    rtf_device = float(np.median(device))
    baseline = 0.066  # reference README.md:3 headline
    result = {
        "metric": "inference_rtf_device",
        "value": round(rtf_device, 6),
        "unit": "rtf",
        "vs_baseline": round(rtf_device / baseline, 6),
        "device_iqr": round(_iqr(device), 6),
        "e2e_median": round(float(np.median(e2e)), 6),
        "e2e_iqr": round(_iqr(e2e), 6),
        # per-call e2e split medians in SECONDS (not RTF): host text
        # frontend + input prep / program enqueue / blocking device_get
        # (device compute + D2H + tunnel RTT)
        "e2e_split_s": {k: round(float(np.median(v)), 6)
                        for k, v in split.items()},
        "audio_seconds": round(audio_seconds, 3),
        "runs": {"e2e": len(e2e), "device": f"5x{n}"},
    }

    # --- optional RTF-vs-length sweep (MBIV_BENCH_SWEEP=1) ---
    # Pins the headline's robustness across the bucket table: short
    # utterances pay proportionally more dispatch overhead, and the
    # beyond-bucket-table granule path (arbitrarily long inputs) gets a
    # timed datapoint. Off by default: fresh buckets pay XLA compiles.
    if os.environ.get("MBIV_BENCH_SWEEP", "0") == "1":
        base = ("ðɪs ɪz ɐ tɛst ʌv ðə mʌltibænd ɪnvɜːs ʃɔːɹt taɪm "
                "fʊɹiɐ tɹænsfɔːɹm sɪstəm. ")
        # xlong_granule: ~900 tokens — past the bucket table into the
        # single-program granule path but under MAX_TEXT_TOKENS.
        # xlong_routed: ~5400 tokens — the AUTO-ROUTED long-text path
        # (phrase-split into <=MAX_TEXT_TOKENS pieces; no quadratic
        # attention blowup, previously this length was un-benchable)
        cases = {"short": "həlˈoʊ wɜːld.", "headline": text,
                 "long_4x": base * 6, "xlong_granule": base * 8,
                 "xlong_routed": base * 48}
        sweep = {}
        for name, txt in cases.items():
            for _ in range(2):
                _, t = module.synthesize(txt, seed=0)
            secs, e2e_i = t["audio_seconds"], []
            for _ in range(7):
                t0 = time.perf_counter()
                module.synthesize(txt, seed=0)
                e2e_i.append((time.perf_counter() - t0) / secs)
            ids_i = module.text_to_ids(txt)
            entry = {
                "audio_s": round(secs, 2),
                "frame_bucket": t["frame_bucket"],
                "rtf_e2e": round(float(np.median(e2e_i)), 6),
            }
            if len(ids_i) <= module.MAX_TEXT_TOKENS:
                # single-program case: device-only RTF via repeat-dispatch
                x_i, xl_i = module._pad_ids_cached(ids_i)
                fn_i = module._infer_jit(t["frame_bucket"])
                dev_i = []
                k = 10
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(k):
                        _, pcm_i = fn_i(module.params, x_i, xl_i, None,
                                        module._dev_scalar(0.667),
                                        module._dev_scalar(1.0),
                                        module._dev_scalar(0.8),
                                        jax.random.PRNGKey(0))
                    jax.device_get(pcm_i.ravel()[:1])
                    dev_i.append(
                        max(time.perf_counter() - t0 - rtt, 0.0) / k / secs)
                entry["rtf_device"] = round(float(np.median(dev_i)), 6)
            else:
                entry["pieces"] = t.get("pieces")
            sweep[name] = entry
        result["rtf_by_length"] = sweep

    print(json.dumps(result))


if __name__ == "__main__":
    main()
