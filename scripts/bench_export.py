#!/usr/bin/env python
"""Exported-artifact serving vs live-jit serving latency (VERDICT r3 #9).

The deploy story (`infer/export.py`) claims the StableHLO artifact is
bit-pinned against the live path; this bench shows it also matches on
latency — the artifact's XLA compile on the target machine should reach
the same executable performance as tracing the model live.

Times the same utterance through
  (a) SynthesisModule.synthesize (live jit, the bench.py path), and
  (b) ExportedServing.synthesize (deserialized StableHLO programs),
reporting median e2e + queue-drain device RTF for both. Prints one JSON
line, including the artifact's run-to-run determinism delta (the deploy
guarantee) and the live-vs-exported waveform delta (bit-equal in f32 —
tests/test_export.py — but two different bf16 compile paths may fuse
differently, so on TPU it is reported rather than asserted).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TEXT = ("ðɪs ɪz ɐ tɛst ʌv ðə mʌltibænd ɪnvɜːs ʃɔːɹt taɪm fʊɹiɐ "
        "tɹænsfɔːɹm sɪstəm fɔːɹ ɛnd tuː ɛnd spiːtʃ sɪnθəsɪs, "
        "ɹʌnɪŋ ɒn ə tɛnsɚ pɹəʊsɛsɪŋ juːnɪt.")


def _median_e2e(synth_fn, n=12):
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        audio, t = synth_fn()
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals)), len(audio)


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.infer.export import export_serving, load_serving
    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule, _next_bucket

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    module = SynthesisModule(
        "configs/ljs_mb_istft_vits.json",
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    # converge the adaptive frame bucket + compile the live program
    for _ in range(3):
        audio_live, t = module.synthesize(TEXT, seed=0)
    bucket, secs = t["frame_bucket"], t["audio_seconds"]
    tb = _next_bucket(len(module.text_to_ids(TEXT)), module.TEXT_BUCKETS)

    out_dir = os.environ.get("MBIV_EXPORT_DIR") or tempfile.mkdtemp(
        prefix="mbiv_export_")
    t0 = time.perf_counter()
    export_serving(module, out_dir, pairs=[(tb, bucket)])
    t_export = time.perf_counter() - t0
    t0 = time.perf_counter()
    served = load_serving(out_dir)
    audio_exp, _ = served.synthesize(TEXT, seed=0)  # load-time XLA compile
    t_load = time.perf_counter() - t0

    # numerics: the deploy guarantee is ARTIFACT determinism — replaying
    # the serialized program must be bit-stable run to run (that is what
    # pins deployed numerics against later code changes). Live-vs-
    # exported is bit-equal in f32 (tests/test_export.py); under bf16
    # the two compile paths may fuse differently, so the waveform delta
    # is reported, not asserted.
    audio_exp2, _ = served.synthesize(TEXT, seed=0)
    det = float(np.max(np.abs(audio_exp - audio_exp2[: len(audio_exp)])))
    audio_live, _ = module.synthesize(TEXT, seed=0)
    n = min(len(audio_live), len(audio_exp))
    max_delta = float(np.max(np.abs(audio_live[:n] - audio_exp[:n])))

    e2e_live, _ = _median_e2e(lambda: module.synthesize(TEXT, seed=0))
    e2e_exp, _ = _median_e2e(lambda: served.synthesize(TEXT, seed=0))

    print(json.dumps({
        "metric": "export_vs_live_e2e",
        "rtf_e2e_live": round(e2e_live / secs, 6),
        "rtf_e2e_exported": round(e2e_exp / secs, 6),
        "exported_over_live": round(e2e_exp / max(e2e_live, 1e-9), 3),
        "artifact_determinism_delta": det,
        "live_vs_exported_delta": max_delta,
        "export_s": round(t_export, 1),
        "load_compile_s": round(t_load, 1),
        "audio_seconds": round(secs, 3),
        "artifact_dir": out_dir,
    }))


if __name__ == "__main__":
    main()
