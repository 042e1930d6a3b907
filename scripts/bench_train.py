#!/usr/bin/env python
"""Training-step throughput on the available devices (flagship config,
synthetic batch). Reports steps/sec and utterance-seconds/sec of audio
trained per second. Also the TPU smoke test for the full train graph
(incl. the Pallas MAS kernel under jax.value_and_grad)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/ljs_mb_istft_vits.json")
    parser.add_argument("--batch", type=int, default=0,
                        help="override batch size (0 = config)")
    parser.add_argument("--spec-frames", type=int, default=400)
    parser.add_argument("--text-len", type=int, default=192)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--no-donate", action="store_true")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 mixed-precision compute (fp16_run)")
    parser.add_argument("--feed-host", action="store_true",
                        help="also time steps with per-step host batch "
                             "feeding (realistic H2D transfer cost)")
    parser.add_argument("--device-spec", action="store_true",
                        help="int16-wav-only feeding with the linear "
                             "spectrogram computed inside the train "
                             "programs (train.py default)")
    parser.add_argument("--widen", type=int, default=1,
                        help="multiply the model's channel widths by N — "
                             "the MFU control experiment: if MFU rises "
                             "with wider convs, the flagship's MFU "
                             "ceiling is its conv geometry (channel "
                             "counts too small to fill the 128x128 MXU), "
                             "not framework overhead")
    parser.add_argument("--flops", action="store_true",
                        help="report XLA cost-analysis FLOPs of the two "
                             "train programs and the achieved share of "
                             "197 TFLOP/s bf16 (TPU v5e peak)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.parallel import create_mesh, shard_batch
    from mb_istft_vits_tpu.train import create_train_state, make_train_step

    cfg = Config.from_json(args.config)
    if args.bf16:
        object.__setattr__(cfg.train, "fp16_run", True)
    if args.batch:
        object.__setattr__(cfg.train, "batch_size", args.batch)
    if args.widen > 1:
        w = args.widen
        m = cfg.model
        for f in ("inter_channels", "hidden_channels", "filter_channels",
                  "upsample_initial_channel"):
            object.__setattr__(m, f, getattr(m, f) * w)
        print(f"widened x{w}: hidden={m.hidden_channels} "
              f"inter={m.inter_channels} filter={m.filter_channels} "
              f"up0={m.upsample_initial_channel}", flush=True)
    b = args.batch or cfg.train.batch_size
    d = cfg.data
    rng = np.random.RandomState(0)
    t_spec, t_x = args.spec_frames, args.text_len
    batch = {
        "x": jnp.asarray(rng.randint(1, cfg.model.n_vocab,
                                     size=(b, t_x)).astype(np.int32)),
        "x_lengths": jnp.asarray(np.full(b, t_x, np.int32)),
        "spec": jnp.asarray((rng.randn(b, t_spec, d.filter_length // 2 + 1)
                             ** 2).astype(np.float32)),
        "spec_lengths": jnp.asarray(np.full(b, t_spec, np.int32)),
        "wav": jnp.asarray(rng.uniform(
            -0.5, 0.5, (b, t_spec * d.hop_length, 1)).astype(np.float32)),
        "wav_lengths": jnp.asarray(np.full(b, t_spec * d.hop_length,
                                           np.int32)),
    }
    if args.device_spec:
        del batch["spec"]
        t_wav = t_spec * d.hop_length + d.filter_length - d.hop_length
        batch["wav"] = jnp.asarray(rng.randint(
            -16384, 16384, (b, t_wav, 1)).astype(np.int16))
    state, synth, disc = create_train_state(cfg, jax.random.PRNGKey(0),
                                            jax.tree.map(lambda a: a[:2],
                                                         batch))
    mesh = create_mesh()
    batch = shard_batch(batch, mesh)
    step = make_train_step(cfg, synth, disc)

    # NOTE: on the axon platform block_until_ready does not actually wait;
    # jax.device_get is the only honest sync point.
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    lg = float(jax.device_get(metrics["loss/g/total"]))
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s  "
          f"loss_g={lg:.3f}", flush=True)

    # split timing: D-program vs G-program (the two jitted halves)
    try:
        # time the halves by pulling d_step/g_step out of the train_step
        # closure (private but stable in-repo)
        cells = {getattr(c.cell_contents, "__name__", None): c.cell_contents
                 for c in step.__closure__ or ()}
        d_prog, g_prog = cells.get("d_step"), cells.get("g_step")
        if d_prog is not None:
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = d_prog(state, batch)
                jax.device_get(out[2])
            print(f"  d_step: {(time.perf_counter()-t0)/args.steps*1e3:.1f} ms",
                  flush=True)
            # g_step donates its inputs, so it cannot be re-run on the same
            # state; its device time is reported as (sync-each step time -
            # d_step) below instead. (Feeding per-leaf copies was tried and
            # is itself pathological over the tunnel: ~4000 tiny dispatches.)
    except Exception as e:  # diagnostics only — never fail the bench
        print(f"  (split timing unavailable: {e})", flush=True)

    # per-step sync (upper bound: adds one tunnel round trip per step)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
        jax.device_get(metrics["loss/g/total"])
    dt_sync = (time.perf_counter() - t0) / args.steps
    # derived g_step device time ≈ dt_sync - d_step - one tunnel RTT
    print(f"step time (sync each): {dt_sync*1e3:.1f} ms", flush=True)

    # steady state: queue all steps, one final sync — how training actually
    # runs (metrics fetched every log_interval=200 steps, train.py)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    jax.device_get(metrics["loss/g/total"])
    dt = (time.perf_counter() - t0) / args.steps

    if args.flops:
        # XLA's own cost analysis of the two compiled train programs:
        # model FLOPs as the compiler sees them (post-fusion), so
        # achieved/peak is an honest MFU on the arithmetic that actually
        # runs. 197 TFLOP/s = TPU v5e bf16 peak per chip.
        try:
            cells = {getattr(c.cell_contents, "__name__", None):
                     c.cell_contents for c in step.__closure__ or ()}
            d_prog, g_prog = cells["d_step"], cells["g_step"]
            fl = d_prog.lower(state, batch).compile() \
                       .cost_analysis()["flops"]
            d_out = jax.eval_shape(d_prog, state, batch)
            fl += g_prog.lower(state, batch, *d_out).compile() \
                        .cost_analysis()["flops"]
            peak = 197e12 if args.bf16 else 197e12 / 2
            print(f"  cost-analysis FLOPs/step: {fl/1e9:.1f} GF  "
                  f"achieved: {fl/dt/1e12:.1f} TFLOP/s  "
                  f"MFU vs {peak/1e12:.0f}T peak: {fl/dt/peak*100:.1f}%",
                  flush=True)
        except Exception as e:  # diagnostics only
            print(f"  (flops analysis unavailable: {e})", flush=True)

    if args.feed_host:
        # REALISTIC feeding: a fresh host batch is shard_batch-ed every
        # step (what train.py actually does). The device-resident loop
        # above hides all H2D bytes; this one pays them. Reports the
        # per-step feed payload so transfer-reduction work is measurable.
        host = {k: np.asarray(v) for k, v in
                ((k, jax.device_get(v)) for k, v in batch.items())}
        nbytes = sum(a.nbytes for a in host.values())
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, shard_batch(dict(host), mesh))
        jax.device_get(metrics["loss/g/total"])
        dt_feed = (time.perf_counter() - t0) / args.steps
        print(f"step time (host-fed): {dt_feed*1e3:.1f} ms  "
              f"feed: {nbytes/1e6:.1f} MB/step  "
              f"({nbytes/max(dt_feed,1e-9)/1e9:.2f} GB/s effective)",
              flush=True)

        # same realistic feeding, but through data.device_prefetch — the
        # double-buffered path train.py actually runs: the H2D enqueue of
        # batch i+1 overlaps step i's execution
        from mb_istft_vits_tpu.data import device_prefetch

        batches = (dict(host) for _ in range(args.steps))
        t0 = time.perf_counter()
        for sharded in device_prefetch(batches,
                                       lambda bt: shard_batch(bt, mesh)):
            state, metrics = step(state, sharded)
        jax.device_get(metrics["loss/g/total"])
        dt_db = (time.perf_counter() - t0) / args.steps
        print(f"step time (host-fed, double-buffered): {dt_db*1e3:.1f} ms",
              flush=True)
    audio_s = b * t_spec * d.hop_length / d.sampling_rate
    print(f"step time: {dt*1e3:.1f} ms  steps/s: {1/dt:.2f}  "
          f"audio-s trained/s: {audio_s/dt:.1f}  "
          f"(batch {b}, {t_spec} frames, {jax.device_count()} devices)")
    for k in ("loss/g/total", "loss/d/total", "grad_norm_g"):
        v = float(metrics[k])
        assert np.isfinite(v), (k, v)
    print("all finite: ok")


if __name__ == "__main__":
    main()
