#!/usr/bin/env python
"""Synthesis CLI: text → wav file with RTF report
(reference run_synthesis.py:26-81, minus PyAudio playback)."""

import argparse
import base64
import wave

import numpy as np


def write_wav(path: str, audio: np.ndarray, sr: int):
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-k", "--checkpoint", default=None,
                        help=".pth (reference format) or omit for random init")
    parser.add_argument("-t", "--text", required=True)
    parser.add_argument("-o", "--output", default="out.wav")
    parser.add_argument("--sid", type=int, default=None)
    parser.add_argument("--noise-scale", type=float, default=0.667)
    parser.add_argument("--length-scale", type=float, default=1.0)
    parser.add_argument("--noise-scale-w", type=float, default=0.8)
    parser.add_argument("--raw-text", action="store_true",
                        help="run cleaners instead of treating input as "
                             "pre-cleaned phonemes")
    parser.add_argument("--print-base64", action="store_true")
    args = parser.parse_args()

    from mb_istft_vits_tpu.infer import get_synthesis_module_instance

    module = get_synthesis_module_instance(args.config, args.checkpoint)
    # warmup compile
    module.synthesize(args.text, sid=args.sid,
                      cleaned=not args.raw_text)
    audio, timings = module.synthesize(
        args.text, sid=args.sid, noise_scale=args.noise_scale,
        length_scale=args.length_scale, noise_scale_w=args.noise_scale_w,
        cleaned=not args.raw_text,
    )
    write_wav(args.output, audio, module.sampling_rate)
    print(f"audio: {timings['audio_seconds']:.3f}s  "
          f"synthesis: {timings['total']:.3f}s  "
          f"Real Time Factor: {timings['rtf']:.4f}")
    # base64 of float32 PCM, preview always printed like the reference
    # (run_synthesis.py:55-63); full dump behind --print-base64. PyAudio
    # playback is omitted (no audio device in this environment).
    b64 = base64.b64encode(audio.astype(np.float32).tobytes()).decode()
    print(f"Base64 encoded data (first 80 chars): {b64[:80]}...")
    if args.print_base64:
        print(b64)


if __name__ == "__main__":
    main()
