#!/usr/bin/env python
"""z round-trip verification: synthesize with z returned, re-decode the same
z, save both wavs (reference run_synthesis_z.py:15-39)."""

import argparse

import numpy as np

from run_synthesis import write_wav


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-k", "--checkpoint", default=None)
    parser.add_argument("-t", "--text", required=True)
    parser.add_argument("--sid", type=int, default=None)
    args = parser.parse_args()

    from mb_istft_vits_tpu.infer import get_synthesis_module_instance

    module = get_synthesis_module_instance(args.config, args.checkpoint)
    audio1, z, _ = module.synthesize_with_z(args.text, sid=args.sid)
    audio2 = module.infer_z_only(z, sid=args.sid)
    write_wav("output_normal.wav", audio1, module.sampling_rate)
    write_wav("output_z.wav", audio2, module.sampling_rate)
    n = min(len(audio1), len(audio2))
    err = float(np.abs(audio1[:n] - audio2[:n]).max())
    print(f"max |normal - z_decode| = {err:.2e} over {n} samples")


if __name__ == "__main__":
    main()
