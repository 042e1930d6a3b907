#!/usr/bin/env python
"""Op-level device profile of the train step (or infer).

Captures a jax.profiler trace around N steady-state train steps, parses the
xplane.pb with the tsl protobuf schema, and prints per-op-category and
top-K-op device-time tables — the MFU attack's scoreboard (VERDICT.md weak
#1). Works on the real TPU; no TensorBoard needed.

Usage:
  python scripts/profile_step.py [--batch 32] [--steps 5] [--bf16]
  python scripts/profile_step.py --parse-only /tmp/jaxprof   # re-analyze
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xspace(logdir: str, top_k: int = 40) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print(f"no xplane.pb under {logdir}")
        return
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    print(f"# {path}")
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name or m.display_name
                for m_id, m in plane.event_metadata.items()}
        by_name: dict = collections.Counter()
        by_cat: dict = collections.Counter()
        total_ps = 0
        # names are full HLO instruction texts like
        # '%fusion.12 = bf16[...]{...} fusion(...), kind=kOutput, ...'
        opcode_re = re.compile(r"=\s*\S+\s+([a-z][a-z0-9_-]*)\(")
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA TPU Ops"):
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                by_name[name] += ev.duration_ps
                m = opcode_re.search(name)
                cat = m.group(1) if m else re.sub(
                    r"[.\d]+$", "", name.split(" ")[0].lstrip("%"))
                by_cat[cat] += ev.duration_ps
                total_ps += ev.duration_ps
        if not total_ps:
            continue
        print(f"\n== plane {plane.name}: total XLA-op time "
              f"{total_ps/1e9:.3f} ms ==")
        print("\n-- by op category --")
        for cat, ps in by_cat.most_common(20):
            print(f"{ps/1e9:10.3f} ms  {100*ps/total_ps:5.1f}%  {cat}")
        print(f"\n-- top {top_k} ops --")
        for name, ps in by_name.most_common(top_k):
            print(f"{ps/1e9:10.3f} ms  {100*ps/total_ps:5.1f}%  {name}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parse-only", metavar="LOGDIR")
    ap.add_argument("--logdir", default="/tmp/jaxprof")
    ap.add_argument("--config", default="configs/ljs_mb_istft_vits.json")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--spec-frames", type=int, default=400)
    ap.add_argument("--text-len", type=int, default=192)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--infer", action="store_true",
                    help="profile the serving infer program instead")
    ap.add_argument("--top-k", type=int, default=40)
    args = ap.parse_args()

    if args.parse_only:
        parse_xspace(args.parse_only, args.top_k)
        return

    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.train import create_train_state, make_train_step

    cfg = Config.from_json(args.config)
    if args.bf16:
        object.__setattr__(cfg.train, "fp16_run", True)
    object.__setattr__(cfg.train, "batch_size", args.batch)
    b, t_x, t_spec = args.batch, args.text_len, args.spec_frames
    d = cfg.data
    rng = np.random.RandomState(0)
    wav_len = t_spec * d.hop_length + (d.filter_length - d.hop_length)
    batch = {
        "x": jnp.asarray(rng.randint(1, cfg.model.n_vocab, (b, t_x)),
                         jnp.int32),
        "x_lengths": jnp.full((b,), t_x, jnp.int32),
        "wav": jnp.asarray(
            (rng.randn(b, wav_len, 1) * 3000).astype(np.int16)),
        "spec_lengths": jnp.full((b,), t_spec, jnp.int32),
    }
    state, synth, disc = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step_fn = make_train_step(cfg, synth, disc)
    # warm up / compile outside the trace
    state, metrics = step_fn(state, batch)
    jax.device_get(metrics["loss/g/total"])
    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            state, metrics = step_fn(state, batch)
        jax.device_get(metrics["loss/g/total"])
    print(f"traced {args.steps} steps -> {args.logdir}")
    parse_xspace(args.logdir, args.top_k)


if __name__ == "__main__":
    main()
