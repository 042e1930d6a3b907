#!/usr/bin/env python
"""Objective voice-conversion evidence on a trained multi-speaker
checkpoint (VERDICT.md r3 item #2; reference models.py:790-798).

The synthetic UUDB corpus (scripts/make_corpus.py --dataset uudb) gives
every speaker a known voice profile (base F0 + vocal-tract formant
scale) and a DETERMINISTIC renderer, so voice conversion has exact
ground truth: re-rendering the source utterance with the TARGET
speaker's profile under the SOURCE utterance's duration seed yields a
time-aligned reference of "this text, this prosody, that voice".

For each (src -> tgt) pair this script reports, for the converted
waveform:
- median voiced F0 vs the target profile's base F0 (pitch tracks
  target?)
- F0 RMSE and LSD against the target-voice ground-truth render vs the
  same metrics against the source wav (is the conversion CLOSER to the
  target's voice than to the source's?)

Usage:
  python scripts/eval_vc.py -c .corpus/uudb/config.json \
      -k logs/<model>/ckpt --pairs 7:0 7:11 8:3 ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-k", "--checkpoint", required=True)
    parser.add_argument("--val-list", default=None,
                        help="filelist to draw source utterances from "
                             "(default: the config's validation_files)")
    parser.add_argument("--pairs", nargs="+", default=None,
                        help="src:tgt sid pairs (default: a spread)")
    parser.add_argument("--out-dir", default=None,
                        help="also write converted wavs here")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from scripts.make_corpus import _plan_jp, _speaker_profile, render
    import scripts.make_corpus as mc
    from mb_istft_vits_tpu.data.dataset import load_wav
    from mb_istft_vits_tpu.dsp import spectrogram
    from mb_istft_vits_tpu.infer import get_synthesis_module_instance
    from mb_istft_vits_tpu.models import Synthesizer
    from mb_istft_vits_tpu.utils.metrics import (
        f0_metrics,
        log_spectral_distance,
        yin_f0,
    )

    module = get_synthesis_module_instance(args.config, args.checkpoint)
    d = module.data_cfg
    mc.SR = d.sampling_rate  # the corpus renderer's module-level rate

    # jitted VC forward: eager apply is hundreds of per-op round trips
    # on the remote-dispatch runtime (minutes per utterance); jitted it
    # is one dispatch per (spec-length bucket) — pad specs to a bucket
    # so the handful of val utterances share one compile
    @jax.jit
    def vc_fn(params, spec, y_lengths, sid_src, sid_tgt):
        return module.model.apply(
            {"params": params}, spec, y_lengths, sid_src, sid_tgt,
            method=Synthesizer.voice_conversion,
            rngs={"noise": jax.random.PRNGKey(0)},
        )

    val_list = args.val_list or d.validation_files
    rows = []  # (path, sid, text)
    with open(val_list) as f:
        for line in f:
            p, sid, txt = line.rstrip("\n").split("|", 2)
            rows.append((p, int(sid), txt))
    by_sid = {}
    for p, sid, txt in rows:
        by_sid.setdefault(sid, (p, txt))

    pairs = ([tuple(map(int, s.split(":"))) for s in args.pairs]
             if args.pairs else None)
    if pairs is None:
        sids = sorted(by_sid)
        pairs = [(sids[i], sids[(i + len(sids) // 2) % len(sids)])
                 for i in range(min(6, len(sids)))]

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    print(f"{'pair':>7} | {'tgtF0':>6} {'convF0':>6} {'srcF0':>6} | "
          f"{'f0c_tgt':>8} {'f0c_src':>8} | {'lsd_tgt':>7} {'lsd_src':>7} "
          f"| verdict")
    n_pass = 0
    for src, tgt in pairs:
        if src not in by_sid:
            print(f"{src}->{tgt}: no val utterance for src, skipped")
            continue
        path, txt = by_sid[src]
        audio, sr = load_wav(path)
        assert sr == d.sampling_rate, (sr, d.sampling_rate)
        wav_src = audio.astype(np.float32) / d.max_wav_value

        spec = spectrogram(jnp.asarray(wav_src[None, :]), d.filter_length,
                           d.hop_length, d.win_length)
        spec = jnp.swapaxes(spec, 1, 2)
        n_frames = spec.shape[1]
        bucket = -(-n_frames // 128) * 128  # shared compile per 128-frame pad
        spec = jnp.pad(spec, ((0, 0), (0, bucket - n_frames), (0, 0)))
        y_lengths = jnp.asarray([n_frames], jnp.int32)
        o_hat, _, _, _ = vc_fn(
            module.params, spec, y_lengths,
            jnp.asarray([src], jnp.int32), jnp.asarray([tgt], jnp.int32))
        conv = np.asarray(
            o_hat[0, : n_frames * d.hop_length, 0], np.float32
        )[: len(wav_src)]

        # ground-truth render: same text, SAME duration seed as the source
        # wav. make_corpus seeds render() with utt_id = f"{sid}_{basename}"
        # INCLUDING the .wav suffix ("0_FJK_C051_029.wav"), so keep it —
        # a different seed jitters durations and misaligns the reference.
        base = os.path.basename(path)
        utt_id = base.split("_", 1)[1]  # "0_FJK_C051_029.wav"
        f0_t, fs_t = _speaker_profile(tgt)
        gt_tgt = render(txt, utt_id, base_f0=f0_t, formant_scale=fs_t,
                        planner=_plan_jp).astype(np.float32)
        n = min(len(conv), len(gt_tgt), len(wav_src))
        conv, gt_tgt, wav_src = conv[:n], gt_tgt[:n], wav_src[:n]

        def med_f0(w):
            f0, v = yin_f0(w, d.sampling_rate, frame_length=1024,
                           hop_length=d.hop_length)
            return float(np.median(f0[v])) if v.any() else 0.0

        m_tgt = f0_metrics(conv, gt_tgt, d.sampling_rate, frame_length=1024)
        m_src = f0_metrics(conv, wav_src, d.sampling_rate, frame_length=1024)
        lsd_tgt = log_spectral_distance(conv, gt_tgt, d.sampling_rate)
        lsd_src = log_spectral_distance(conv, wav_src, d.sampling_rate)
        ok = (m_tgt["f0_rmse_cents"] < m_src["f0_rmse_cents"]
              and lsd_tgt < lsd_src)
        n_pass += ok
        print(f"{src:>3}->{tgt:<3} | {f0_t:6.1f} {med_f0(conv):6.1f} "
              f"{med_f0(wav_src):6.1f} | {m_tgt['f0_rmse_cents']:8.1f} "
              f"{m_src['f0_rmse_cents']:8.1f} | {lsd_tgt:7.2f} "
              f"{lsd_src:7.2f} | "
              f"{'TRACKS TARGET' if ok else 'closer to src'}")
        if args.out_dir:
            from run_synthesis import write_wav

            write_wav(os.path.join(args.out_dir, f"vc_{src}_to_{tgt}.wav"),
                      conv, d.sampling_rate)
    print(f"{n_pass}/{len(pairs)} conversions track the target speaker "
          f"(F0 cents + LSD both closer to target than source)")


if __name__ == "__main__":
    main()
