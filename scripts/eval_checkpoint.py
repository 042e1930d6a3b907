#!/usr/bin/env python
"""Offline copy-synthesis evaluation of a checkpoint over a filelist.

The train loop's periodic eval scores ONE validation utterance
(train.py:evaluate); this script scores N of them from any checkpoint —
orbax model dir / ckpt step dir, or a reference `.pth` — so milestone
checkpoints (the 25k-step multiples the pruner keeps) get a
variance-bearing quality readout: per-utterance copy-synthesis MCD /
LSD / F0-RMSE / voicing-decision-error, reported as mean +/- std with
the worst utterance named.

Copy-synthesis = posterior-encode the ground-truth spectrogram and
decode (Synthesizer.reconstruct) — time-aligned with the ground truth,
so the metrics are well-defined without DTW (the reference logs
TensorBoard audio only; SURVEY.md section 4).

Usage:
  python scripts/eval_checkpoint.py -c CONFIG -k CHECKPOINT \
      [-f FILELIST] [-n 16] [--sid-col] [--out JSON]
FILELIST defaults to the config's validation_files. Static shapes: specs
are bucketed to the next multiple of 64 frames, one compile per bucket.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-k", "--checkpoint", required=True)
    ap.add_argument("-f", "--filelist", default=None)
    ap.add_argument("-n", "--num", type=int, default=16)
    ap.add_argument("--out", default=None, help="write full JSON here")
    ap.add_argument("--bands", action="store_true",
                    help="also report LSD per frequency quartile "
                         "(0-25/25-50/50-75/75-100%% of Nyquist) — "
                         "locates WHERE the residual error lives")
    ap.add_argument("--tts", action="store_true",
                    help="ALSO score the text->speech product path: "
                         "synthesize each utterance from its TEXT via "
                         "Synthesizer.infer (duration predictor -> "
                         "generate_path -> flow -> decode, the "
                         "reference models.py:697-737) and report "
                         "DTW-aligned MCD plus the predicted/GT "
                         "duration ratio. Copy-synthesis proves the "
                         "vocoder tail; this proves the system.")
    ap.add_argument("--save-audio", default=None, metavar="DIR",
                    help="write GT / copy-synthesis / TTS wavs for the "
                         "first 3 utterances to DIR — durable on-disk "
                         "audio evidence committed alongside the JSON "
                         "(the r4 lesson: artifacts queued for later "
                         "are artifacts lost)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.data import TextAudioDataset
    from mb_istft_vits_tpu.dsp import spectrogram
    from mb_istft_vits_tpu.models import Synthesizer
    from mb_istft_vits_tpu.train.checkpoint import load_generator_params
    from mb_istft_vits_tpu.utils.metrics import (
        f0_metrics,
        log_spectral_distance,
        mel_cepstral_distortion,
    )

    cfg = Config.from_json(args.config)
    d = cfg.data
    filelist = args.filelist or d.validation_files
    ds = TextAudioDataset(filelist, d, device_spec=True)
    n = min(args.num, len(ds))

    params = load_generator_params(args.checkpoint)
    synth = Synthesizer(cfg.model)

    @jax.jit
    def recon_fn(spec, spec_lengths, sid, rng):
        out, _ = synth.apply(
            {"params": params}, spec, spec_lengths, sid=sid,
            method=Synthesizer.reconstruct, rngs={"noise": rng},
        )
        return out

    from functools import partial

    @partial(jax.jit, static_argnames=("max_frames",))
    def infer_fn(x, x_lengths, sid, rng, max_frames):
        return synth.apply(
            {"params": params}, x, x_lengths, sid=sid,
            max_frames=max_frames, method=Synthesizer.infer,
            rngs={"noise": rng},
        )

    multi = d.n_speakers > 1
    # one static max_frames for the whole run (one infer compile per
    # 64-token text bucket): the longest GT with 50% duration headroom
    tts_max_frames = 0
    if args.tts:
        longest = max(len(np.asarray(ds[i]["wav"]).reshape(-1))
                      for i in range(n))
        tts_max_frames = ((longest // d.hop_length) * 3 // 2 // 256
                          + 1) * 256
    rows = []
    for i in range(n):
        item = ds[i]
        gt = np.asarray(item["wav"], np.float32).reshape(-1)
        spec = spectrogram(
            jnp.asarray(gt[None]), d.filter_length, d.hop_length,
            d.win_length,
        ).transpose(0, 2, 1)  # [1, F, bins]
        f = spec.shape[1]
        fpad = -(-f // 64) * 64  # static bucket: one compile per 64-frame step
        spec = jnp.pad(spec, ((0, 0), (0, fpad - f), (0, 0)))
        sid = (jnp.asarray([item.get("sid", 0)], jnp.int32) if multi
               else None)
        out = recon_fn(spec, jnp.asarray([f], jnp.int32), sid,
                       jax.random.PRNGKey(i))
        recon = np.asarray(out[0, : f * d.hop_length, 0], np.float32)
        sr = d.sampling_rate
        row = {
            "i": i,
            "audio_s": round(len(gt) / sr, 2),
            "mcd": mel_cepstral_distortion(
                gt, recon, sr, n_fft=d.filter_length,
                hop_length=d.hop_length, win_length=d.win_length,
                n_mels=min(d.n_mel_channels, d.filter_length // 2 + 1)),
            "lsd": log_spectral_distance(
                gt, recon, sr, n_fft=d.filter_length,
                hop_length=d.hop_length, win_length=d.win_length),
        }
        if len(gt) >= 4096:
            m = f0_metrics(gt, recon, sr)
            row["f0_rmse_hz"] = m["f0_rmse_hz"]
            row["vde"] = m["voicing_decision_error"]
        if args.bands:
            from mb_istft_vits_tpu.dsp.stft import stft_magnitude

            mags = [np.maximum(np.asarray(stft_magnitude(
                jnp.asarray(w[None].astype(np.float32)), d.filter_length,
                d.hop_length, d.win_length))[0].astype(np.float64) ** 2,
                1e-20) for w in (gt, recon[: len(gt)])]
            floor = max(m2.max() for m2 in mags) * 1e-6  # top 60 dB
            keep = mags[0].max(axis=0) > floor
            mags = [np.maximum(m2[:, keep], floor) for m2 in mags]
            nb = mags[0].shape[0]
            for q in range(4):
                sl = slice(q * nb // 4, (q + 1) * nb // 4)
                la, lb = (10.0 * np.log10(m2[sl]) for m2 in mags)
                row[f"lsd_q{q}"] = round(float(np.mean(np.sqrt(np.mean(
                    (la - lb) ** 2, axis=0)))), 3)
        if args.tts:
            from mb_istft_vits_tpu.utils.metrics import mcd_dtw

            x = np.asarray(item["x"], np.int64)
            xpad = -(-len(x) // 64) * 64  # 64-token text buckets
            xb = jnp.asarray(np.pad(x, (0, xpad - len(x)))[None])
            out = infer_fn(xb, jnp.asarray([len(x)], jnp.int32), sid,
                           jax.random.PRNGKey(1000 + i), tts_max_frames)
            n_syn = int(out.y_lengths[0]) * d.hop_length
            syn = np.asarray(out.o[0, :n_syn, 0], np.float32)
            t = mcd_dtw(gt, syn, sr, n_fft=d.filter_length,
                        hop_length=d.hop_length, win_length=d.win_length,
                        n_mels=min(d.n_mel_channels,
                                   d.filter_length // 2 + 1))
            row["mcd_tts_dtw"] = t["mcd_dtw"]
            row["dur_ratio_tts"] = t["dur_ratio"]
        if args.save_audio and i < 3:
            from mb_istft_vits_tpu.utils.observability import (
                encode_wav_bytes,
            )

            os.makedirs(args.save_audio, exist_ok=True)
            clips = {"gt": gt, "copy": recon[: len(gt)]}
            if args.tts:
                clips["tts"] = syn
            for tag, wav in clips.items():
                with open(os.path.join(args.save_audio,
                                       f"utt{i}_{tag}.wav"), "wb") as fh:
                    fh.write(encode_wav_bytes(wav, sr))
        rows.append(row)
        print(f"[{i+1}/{n}] mcd={row['mcd']:.2f} lsd={row['lsd']:.2f} "
              + (f"tts_dtw={row['mcd_tts_dtw']:.2f} "
                 f"dur={row['dur_ratio_tts']:.2f} " if args.tts else "")
              + f"({row['audio_s']}s)", flush=True)

    def agg(key):
        v = [r[key] for r in rows if key in r]
        return {"mean": round(float(np.mean(v)), 3),
                "std": round(float(np.std(v)), 3),
                "max": round(float(np.max(v)), 3)} if v else None

    worst = max(rows, key=lambda r: r["mcd"])
    summary = {
        "checkpoint": args.checkpoint,
        "n_utts": n,
        "mcd": agg("mcd"),
        "lsd": agg("lsd"),
        "f0_rmse_hz": agg("f0_rmse_hz"),
        "vde": agg("vde"),
        "worst_utt": {"i": worst["i"], "mcd": round(worst["mcd"], 3)},
    }
    if args.tts:
        summary["mcd_tts_dtw"] = agg("mcd_tts_dtw")
        summary["dur_ratio_tts"] = agg("dur_ratio_tts")
    if args.bands:
        summary["lsd_bands"] = {f"q{q}": agg(f"lsd_q{q}")["mean"]
                                for q in range(4)}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"summary": summary, "rows": rows}, fh, indent=1)


if __name__ == "__main__":
    main()
