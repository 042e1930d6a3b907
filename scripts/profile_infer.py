#!/usr/bin/env python
"""Dissect single-utterance synthesis time: probe / device infer / host
conversion, plus latents-vs-decoder split. Run on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mb_istft_vits_tpu.utils.platform import apply_env_platform

apply_env_platform()

import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.infer.synthesis import SynthesisModule, _next_bucket


def _sync(out):
    """Honest sync: block_until_ready does NOT wait on the axon platform;
    fetching one element (device_get) is the only real sync point."""
    leaves = [a for a in jax.tree.leaves(out) if hasattr(a, "dtype")]
    jax.device_get(leaves[-1].ravel()[:1])


def timeit(fn, n=20):
    _sync(fn())  # warm/compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)  # device executes the queue serially; drain = n * device time
    return (time.perf_counter() - t0) / n


def main():
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    module = SynthesisModule(
        "configs/ljs_mb_istft_vits.json",
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    text = ("ðɪs ɪz ɐ tɛst ʌv ðə mʌltibænd ɪnvɜːs ʃɔːɹt taɪm fʊɹiɐ "
            "tɹænsfɔːɹm sɪstəm fɔːɹ ɛnd tuː ɛnd spiːtʃ sɪnθəsɪs, "
            "ɹʌnɪŋ ɒn ə tɛnsɚ pɹəʊsɛsɪŋ juːnɪt.")
    audio, timings = module.synthesize(text, seed=0)
    print("e2e:", timings)

    ids = module.text_to_ids(text)
    x, x_lengths = module._pad_ids(ids)
    print(f"tokens={len(ids)} text_bucket={x.shape[1]}")
    rng = jax.random.PRNGKey(0)

    # knobs in the strong-f32 device-scalar form synthesize() uses, so
    # these profile the SAME compiled programs (raw floats would trace
    # weak-typed duplicates)
    ns, ls, nsw = (module._dev_scalar(v) for v in (0.667, 1.0, 0.8))
    t_probe = timeit(lambda: module._probe_jit_call(
        x, x_lengths, None, ls, nsw, rng))
    frames = int(module._probe_jit_call(x, x_lengths, None, ls, nsw,
                                        rng)[0])
    bucket = _next_bucket(frames, module.FRAME_BUCKETS)
    print(f"frames={frames} bucket={bucket} "
          f"audio={frames * 256 / 22050:.2f}s")

    fn = module._infer_jit(bucket)
    t_infer = timeit(lambda: fn(module.params, x, x_lengths, None, ns,
                                ls, nsw, rng))

    lat = module._latents_jit(bucket)
    t_lat = timeit(lambda: lat(module.params, x, x_lengths, None, ns,
                               ls, nsw, rng))

    out, pcm16 = fn(module.params, x, x_lengths, None, ns, ls, nsw, rng)
    t0 = time.perf_counter()
    for _ in range(20):
        _ = np.asarray(pcm16)  # D2H of the int16 audio
    t_host = (time.perf_counter() - t0) / 20

    dec = module._decode_jit(bucket)
    z = out.latents[0]
    t_dec = timeit(lambda: dec(module.params, z, None))

    audio_s = frames * 256 / 22050
    print(f"probe:   {t_probe*1e3:8.2f} ms")
    print(f"infer:   {t_infer*1e3:8.2f} ms  (device rtf "
          f"{t_infer/audio_s:.5f})")
    print(f"latents: {t_lat*1e3:8.2f} ms")
    print(f"decode:  {t_dec*1e3:8.2f} ms")
    print(f"host cp: {t_host*1e3:8.2f} ms")
    print(f"e2e rtf: {timings['rtf']:.5f}  device-only rtf: "
          f"{(t_probe + t_infer)/audio_s:.5f}")

    # streaming: time-to-first-audio + chunk cadence (pipelined decode)
    t0 = time.perf_counter()
    z, y_len, sid = module.prepare_shared_latents(text, seed=0)
    t_latents = time.perf_counter() - t0
    for warm in range(2):  # compile the chunk program
        list(module.stream_from_latents(z[:96], sid, chunk_frames=64,
                                        overlap_frames=8))
    t0 = time.perf_counter()
    marks = []
    total = 0
    for chunk in module.stream_from_latents(z, sid, chunk_frames=64,
                                            overlap_frames=8):
        total += len(chunk)
        marks.append(time.perf_counter() - t0)
    audio_total = total / module.sampling_rate
    print(f"stream: latents {t_latents*1e3:.1f} ms, first audio "
          f"+{marks[0]*1e3:.1f} ms, {len(marks)} chunks in "
          f"{marks[-1]*1e3:.1f} ms ({audio_total:.2f}s audio, "
          f"stream rtf {marks[-1]/audio_total:.5f})")


if __name__ == "__main__":
    main()
