#!/usr/bin/env python
"""Offline text cleaning over filelists → `.cleaned` files
(reference preprocess.py:15-25)."""

import argparse

from mb_istft_vits_tpu.data import load_filepaths_and_text
from mb_istft_vits_tpu.text import get_module


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_extension", default="cleaned")
    parser.add_argument("--text_index", default=1, type=int)
    parser.add_argument("--filelists", nargs="+", required=True)
    parser.add_argument("--text_cleaners", nargs="+",
                        default=["english_cleaners2"])
    parser.add_argument("--text_module", default="text")
    args = parser.parse_args()

    mod = get_module(args.text_module)
    for filelist in args.filelists:
        print("START:", filelist)
        # min_cols: a stray under-columned row must be dropped by the
        # hardened loader, not crash at row[text_index] mid-run
        rows = load_filepaths_and_text(filelist,
                                       min_cols=args.text_index + 1)
        for row in rows:
            original = row[args.text_index]
            row[args.text_index] = mod._clean_text(original,
                                                   args.text_cleaners)
        out = filelist + "." + args.out_extension
        with open(out, "w", encoding="utf-8") as f:
            f.writelines(["|".join(r) + "\n" for r in rows])
        print("DONE:", out)


if __name__ == "__main__":
    main()
