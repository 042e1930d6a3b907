#!/usr/bin/env python
"""Batched filelist synthesis CLI (the reference's batch workflow,
infer.ipynb cell 13, as a proper entry point).

Reads a reference-format filelist (`out_name|text` or `out_name|sid|text`),
synthesizes every utterance through the bucketed batched programs (sharded
over a device mesh when more than one chip is visible), and writes wavs.
"""

import argparse
import os


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-k", "--checkpoint", default=None,
                        help=".pth / orbax model dir (random init if unset)")
    parser.add_argument("-f", "--filelist", required=True)
    parser.add_argument("-o", "--out-dir", default="synth_out")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--noise-scale", type=float, default=0.667)
    parser.add_argument("--length-scale", type=float, default=1.0)
    parser.add_argument("--noise-scale-w", type=float, default=0.8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out-sample-rate", type=int, default=0,
                        help="resample output wavs to this rate on-device "
                             "(windowed-sinc polyphase fused into the "
                             "synthesis program; 0 = model rate)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule
    from mb_istft_vits_tpu.parallel import create_mesh
    from run_synthesis import write_wav

    mesh = create_mesh()
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    module = SynthesisModule(
        args.config, checkpoint_path=args.checkpoint,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        mesh=mesh if mesh.size > 1 else None,
    )

    rows = []
    with open(args.filelist, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line:
                continue
            if "|" not in line:
                print(f"skipping line {ln} (no '|' separator): {line!r}")
                continue
            name, rest = line.split("|", 1)
            # `name|sid|text` when the middle field is an integer;
            # otherwise everything after the first '|' is the text
            # (which may itself contain '|')
            sid, text = None, rest
            if "|" in rest:
                maybe_sid, after = rest.split("|", 1)
                if maybe_sid.strip().isdigit():
                    sid, text = int(maybe_sid), after
            rows.append((name, sid, text))

    os.makedirs(args.out_dir, exist_ok=True)
    seen_names: dict = {}  # duplicate basenames must not overwrite
    total_audio, total_time = 0.0, 0.0
    for lo in range(0, len(rows), args.batch):
        chunk = rows[lo : lo + args.batch]
        audios, timings = module.synthesize_batch(
            [r[2] for r in chunk],
            sids=[r[1] for r in chunk],
            noise_scale=args.noise_scale,
            length_scale=args.length_scale,
            noise_scale_w=args.noise_scale_w,
            seed=args.seed + lo,
            out_sample_rate=args.out_sample_rate or None,
        )
        for (name, _sid, _text), audio in zip(chunk, audios):
            stem = os.path.splitext(os.path.basename(name))[0]
            n = seen_names.get(stem, 0)
            seen_names[stem] = n + 1
            base = f"{stem}.wav" if n == 0 else f"{stem}_{n + 1}.wav"
            write_wav(os.path.join(args.out_dir, base), np.asarray(audio),
                      args.out_sample_rate or module.sampling_rate)
        total_audio += timings["audio_seconds"]
        total_time += timings["total"]
        print(f"[{lo + len(chunk)}/{len(rows)}] "
              f"{timings['utterances_per_sec']:.1f} utt/s "
              f"rtf {timings['rtf']:.5f}", flush=True)
    print(f"done: {len(rows)} utterances, {total_audio:.1f}s audio in "
          f"{total_time:.1f}s (overall RTF {total_time / max(total_audio, 1e-9):.5f})")


if __name__ == "__main__":
    main()
