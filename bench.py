#!/usr/bin/env python
"""Headline benchmark: single-utterance synthesis RTF on one TPU chip.

Prints ONE JSON line:
  {"metric": "inference_rtf", "value": <RTF>, "unit": "rtf",
   "vs_baseline": <RTF / 0.066>}

Baseline: the reference's README headline RTF of 0.066 on an Intel i7 CPU
(reference README.md:3; see BASELINE.md). vs_baseline < 1.0 means faster
than the reference; the north-star target is RTF < 0.01 on one TPU v5e.

Flagship model: ljs_mb_istft_vits (the paper's headline config), random
weights (RTF is weight-independent), bf16 compute.
"""

import json
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


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

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
        module.synthesize(text, seed=0)
    # timed runs
    rtfs = []
    for i in range(10):
        t0 = time.perf_counter()
        audio, timings = module.synthesize(text, seed=i)
        rtfs.append(timings["rtf"])
    rtf = float(np.median(rtfs))
    baseline = 0.066  # reference README.md:3 headline
    print(json.dumps({
        "metric": "inference_rtf",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(rtf / baseline, 6),
    }))


if __name__ == "__main__":
    main()
