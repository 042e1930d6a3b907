#!/usr/bin/env python
"""Objective TTS evaluation between pairs of wav files.

Computes the metric suite of `utils/metrics.py` — MCD, log-spectral
distance, F0 RMSE (Hz/cents), gross pitch error, voicing decision error —
for a reference/degraded wav pair, or for every same-named pair across two
directories. The waveforms must be time-aligned (e.g. ground truth vs
copy-synthesis, or two decodes of the same latents — the repo's
fidelity-comparison workflows).

Usage:
  python scripts/eval_metrics.py ref.wav test.wav
  python scripts/eval_metrics.py ref_dir/ test_dir/ --json out.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load(path: str):
    from mb_istft_vits_tpu.data.dataset import load_wav

    audio, sr = load_wav(path)
    audio = np.asarray(audio, np.float32)
    peak = np.abs(audio).max()
    if peak > 2.0:  # int-range wav; normalize like the reference loader
        audio = audio / 32768.0
    return audio, sr


def _pair_metrics(ref_path: str, test_path: str) -> dict:
    from mb_istft_vits_tpu.utils.metrics import (
        f0_metrics,
        log_spectral_distance,
        mel_cepstral_distortion,
    )

    ref, sr_a = _load(ref_path)
    test, sr_b = _load(test_path)
    if sr_a != sr_b:
        raise SystemExit(
            f"sample-rate mismatch: {ref_path} {sr_a} vs {test_path} {sr_b}"
            " (resample first, e.g. dsp.resample.resample_poly)")
    out = {
        "ref": ref_path,
        "test": test_path,
        "sr": sr_a,
        "mcd_db": mel_cepstral_distortion(ref, test, sr_a),
        "lsd_db": log_spectral_distance(ref, test, sr_a),
    }
    if min(len(ref), len(test)) >= 4096:
        out.update(f0_metrics(ref, test, sr_a))
    return out


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    parser = argparse.ArgumentParser()
    parser.add_argument("ref", help="reference wav file or directory")
    parser.add_argument("test", help="test wav file or directory")
    parser.add_argument("--json", default=None,
                        help="write per-pair results to this JSON file")
    args = parser.parse_args()

    if os.path.isdir(args.ref):
        names = sorted(
            n for n in os.listdir(args.ref)
            if n.endswith(".wav")
            and os.path.exists(os.path.join(args.test, n)))
        if not names:
            raise SystemExit("no same-named wav pairs found")
        pairs = [(os.path.join(args.ref, n), os.path.join(args.test, n))
                 for n in names]
    else:
        pairs = [(args.ref, args.test)]

    results = [_pair_metrics(r, t) for r, t in pairs]
    keys = ("mcd_db", "lsd_db", "f0_rmse_hz", "f0_rmse_cents",
            "gross_pitch_error", "voicing_decision_error")
    for res in results:
        line = "  ".join(f"{k}={res[k]:.4f}" for k in keys if k in res)
        print(f"{os.path.basename(res['test'])}: {line}")
    if len(results) > 1:
        print("mean: " + "  ".join(
            f"{k}={np.mean([r[k] for r in results if k in r]):.4f}"
            for k in keys if any(k in r for r in results)))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
