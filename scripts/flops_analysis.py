#!/usr/bin/env python
"""Speed-of-light accounting for the two train programs and the serving
forward: algorithmic FLOPs (XLA HLO cost analysis of the lowered
programs) vs measured step times -> MXU utilization on one chip.

Runs on CPU by default (lowering + cost analysis only, no execution;
FLOP counts are platform-independent). Pair the output with the
measured TPU times from scripts/bench_train.py / bench.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/ljs_mb_istft_vits.json")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--spec-frames", type=int, default=400)
    parser.add_argument("--text-len", type=int, default=192)
    parser.add_argument("--infer-frames", type=int, default=512)
    parser.add_argument("--peak-tflops", type=float, default=197.0,
                        help="chip peak bf16 TFLOP/s for the utilization "
                             "column (197 = TPU v5e)")
    parser.add_argument("--hbm-gbps", type=float, default=819.0,
                        help="chip HBM bandwidth GB/s for the roofline "
                             "column (819 = TPU v5e)")
    parser.add_argument("--cpu", action="store_true", default=True)
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.models import Synthesizer
    from mb_istft_vits_tpu.train import create_train_state, make_train_step

    cfg = Config.from_json(args.config)
    object.__setattr__(cfg.train, "fp16_run", True)
    object.__setattr__(cfg.train, "batch_size", args.batch)
    b, t_spec, t_x = args.batch, args.spec_frames, args.text_len
    d = cfg.data
    rng = np.random.RandomState(0)
    t_wav = t_spec * d.hop_length + d.filter_length - d.hop_length
    batch = {
        "x": jnp.asarray(rng.randint(1, cfg.model.n_vocab,
                                     size=(b, t_x)).astype(np.int32)),
        "x_lengths": jnp.asarray(np.full(b, t_x, np.int32)),
        "spec_lengths": jnp.asarray(np.full(b, t_spec, np.int32)),
        "wav": jnp.asarray(rng.randint(-16000, 16000,
                                       (b, t_wav, 1)).astype(np.int16)),
        "wav_lengths": jnp.asarray(np.full(b, t_spec * d.hop_length,
                                           np.int32)),
    }
    state, synth, disc = create_train_state(
        cfg, jax.random.PRNGKey(0), jax.tree.map(lambda a: a[:2], batch))
    step = make_train_step(cfg, synth, disc)
    cells = {getattr(c.cell_contents, "__name__", None): c.cell_contents
             for c in step.__closure__ or ()}
    d_prog, g_prog = cells["d_step"], cells["g_step"]

    def report(name, ca, note=""):
        flops = ca["flops"]
        sol_ms = flops / (args.peak_tflops * 1e12) * 1e3
        # roofline: the program can go no faster than max(MXU time,
        # HBM time). XLA's "bytes accessed" counts each operand/result
        # of each HLO op, i.e. an upper bound that ignores fusion — the
        # true HBM traffic lies between the post-fusion result bytes
        # and this number; both bounds are printed.
        byt = ca.get("bytes accessed", 0.0)
        bw_ms = byt / (args.hbm_gbps * 1e9) * 1e3
        print(f"{name}: {flops/1e9:.1f} GFLOP  "
              f"speed-of-light {sol_ms:.2f} ms @ {args.peak_tflops:.0f} "
              f"TFLOP/s bf16 | {byt/1e9:.2f} GB accessed (pre-fusion "
              f"bound) -> {bw_ms:.2f} ms @ {args.hbm_gbps:.0f} GB/s "
              f"{note}")

    lowered_d = d_prog.lower(state, batch)
    ca_d = lowered_d.cost_analysis()
    report("d_step", ca_d)

    out_shapes = jax.eval_shape(lambda s, bt: d_prog(s, bt), state, batch)
    d_out = jax.tree.map(
        lambda sh: jnp.zeros(sh.shape, sh.dtype), out_shapes)
    lowered_g = g_prog.lower(state, batch, *d_out)
    ca_g = lowered_g.cost_analysis()
    report("g_step", ca_g)
    report("train_step total",
           {"flops": ca_d["flops"] + ca_g["flops"],
            "bytes accessed": ca_d.get("bytes accessed", 0.0)
            + ca_g.get("bytes accessed", 0.0)},
           "(cf. measured device-resident step time)")

    # serving forward at a typical frame bucket
    model = Synthesizer(cfg.model)
    x = batch["x"][:1]
    xl = batch["x_lengths"][:1]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2), "slice": jax.random.PRNGKey(3)},
        x, xl, jnp.zeros((1, 64, cfg.model.spec_channels)),
        jnp.asarray([64], jnp.int32), train=False)

    def infer_fn(params, x, xl):
        return model.apply(
            {"params": params}, x, xl, max_frames=args.infer_frames,
            method=Synthesizer.infer,
            rngs={"noise": jax.random.PRNGKey(0)}).o

    lowered_i = jax.jit(infer_fn).lower(variables["params"], x, xl)
    ca_i = lowered_i.cost_analysis()
    audio_s = args.infer_frames * d.hop_length / d.sampling_rate
    sol = ca_i["flops"] / (args.peak_tflops * 1e12)
    print(f"infer({args.infer_frames} frames): {ca_i['flops']/1e9:.1f} "
          f"GFLOP  speed-of-light {sol*1e3:.2f} ms -> RTF floor "
          f"{sol/audio_s:.6f} for {audio_s:.2f}s audio")


if __name__ == "__main__":
    main()
