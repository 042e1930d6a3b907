#!/usr/bin/env python
"""Export a versioned serving artifact (serialized StableHLO programs +
params) from a config + checkpoint. See infer/export.py.

    python scripts/export_serving.py -c configs/ljs_mb_istft_vits.json \
        -k G_800000.pth -o artifacts/ljs_mb \
        [--platforms cpu tpu] [--pairs 64:256 128:512]

A deployed artifact replays the exported computation bit-for-bit —
model-code changes after export cannot alter serving numerics — and a
CPU box can produce TPU artifacts (--platforms cpu tpu).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-k", "--checkpoint", default=None,
                        help=".pth / orbax dir (random init if unset)")
    parser.add_argument("-o", "--out-dir", required=True)
    parser.add_argument("--platforms", nargs="*", default=None,
                        help="lowering platforms, e.g. --platforms cpu tpu")
    parser.add_argument("--pairs", nargs="*", default=None, metavar="TB:FB",
                        help="explicit text:frame bucket pairs to export")
    args = parser.parse_args()

    from mb_istft_vits_tpu.infer.export import export_serving
    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule

    pairs = None
    if args.pairs:
        pairs = [tuple(int(v) for v in p.split(":")) for p in args.pairs]

    module = SynthesisModule(args.config, args.checkpoint)
    manifest = export_serving(module, args.out_dir, pairs=pairs,
                              platforms=args.platforms)
    total = sum(
        os.path.getsize(os.path.join(args.out_dir, f))
        for f in os.listdir(args.out_dir)
    )
    print(f"exported {len(manifest['pairs'])} bucket pairs for platforms "
          f"{manifest['platforms']} to {args.out_dir} "
          f"({total / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
