#!/usr/bin/env python
"""Training CLI, mirroring the reference `python train_latest.py -c <cfg>
-m <name>` (reference train_latest.py / utils.py:158-185).

Single-program SPMD: one process per host, all local devices in a 1-D
'data' mesh (multi-host via jax.distributed.initialize when
JAX_COORDINATOR_ADDRESS is set). Rank-0 duties (logging, TensorBoard,
checkpointing, eval) follow jax.process_index() == 0.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time


def get_logger(model_dir: str, filename: str = "train.log"):
    """reference utils.py:228-240"""
    logger = logging.getLogger(os.path.basename(model_dir))
    logger.setLevel(logging.DEBUG)
    # orbax/absl attach a root handler on first checkpoint restore; without
    # this every later line would print twice (once per handler chain)
    logger.propagate = False
    formatter = logging.Formatter(
        "%(asctime)s\t%(name)s\t%(levelname)s\t%(message)s"
    )
    os.makedirs(model_dir, exist_ok=True)
    h = logging.FileHandler(os.path.join(model_dir, filename))
    h.setFormatter(formatter)
    logger.addHandler(h)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(formatter)
    logger.addHandler(sh)
    return logger


def check_git_hash(model_dir: str, logger):
    """reference utils.py:208-225"""
    import subprocess

    source_dir = os.path.dirname(os.path.realpath(__file__))
    if not os.path.exists(os.path.join(source_dir, ".git")):
        return
    # resolve HEAD of THIS repo, not whatever git repo the process was
    # launched from (subprocess.getoutput runs in the CWD)
    cur_hash = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=source_dir,
        capture_output=True, text=True,
    ).stdout.strip()
    path = os.path.join(model_dir, "githash")
    if os.path.exists(path):
        saved = open(path).read()
        if saved != cur_hash:
            logger.warning("git hash mismatch: %s(saved) != %s(current)",
                           saved[:8], cur_hash[:8])
    else:
        open(path, "w").write(cur_hash)


def make_eval_dataset(cfg, logger):
    """Build the validation dataset ONCE at startup (filelist parse +
    text cleaning for every row is seconds-to-minutes of host work with
    phonemizer-backed cleaners — too much to repeat every eval, and a
    broken validation filelist should surface before training starts)."""
    from mb_istft_vits_tpu.data import TextAudioDataset

    try:
        return TextAudioDataset(cfg.data.validation_files, cfg.data,
                                seed=cfg.train.seed)
    except (OSError, ValueError, IndexError, KeyError) as e:
        logger.warning("eval disabled: %s", e)
        return None


_EVAL_JITS = {}


def _eval_jits(synth):
    """Jitted eval forwards, cached per Synthesizer instance.

    `evaluate` used to call synth.apply eagerly — on a remote-dispatch
    runtime that is hundreds of per-op round trips per eval utterance
    (VERDICT.md r2 weak #5). Jitted, an eval synthesis is ONE dispatch;
    the eval item and max_frames are fixed across evals so each variant
    compiles exactly once per run."""
    import jax

    from mb_istft_vits_tpu.models import Synthesizer

    key = id(synth)
    if key not in _EVAL_JITS:
        def infer_fn(params, x, x_lengths, sid, rng):
            return synth.apply(
                {"params": params}, x, x_lengths, sid=sid, max_frames=1000,
                method=Synthesizer.infer, rngs={"noise": rng},
            )

        def recon_fn(params, spec, spec_lengths, sid, rng):
            return synth.apply(
                {"params": params}, spec, spec_lengths, sid=sid,
                method=Synthesizer.reconstruct, rngs={"noise": rng},
            )

        _EVAL_JITS[key] = (jax.jit(infer_fn), jax.jit(recon_fn))
    return _EVAL_JITS[key]


def evaluate(cfg, synth, state, writer, global_step, logger, eval_ds):
    """Synthesize one validation utterance (per speaker for multi-speaker)
    to TensorBoard, plus ground truth and alignment/mel plots
    (reference train_latest.py:256-263,275-319)."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mb_istft_vits_tpu.models import Synthesizer
    from mb_istft_vits_tpu.utils import plot_alignment_to_numpy, summarize

    if eval_ds is None or len(eval_ds) == 0 or writer is None:
        return None
    # fetch the (data-parallel-replicated) params to host once: under
    # multi-host SPMD the train-state arrays span all hosts' devices, and
    # a rank-0-only apply on them would launch a collective program from
    # one process and deadlock; local host params keep eval single-process
    state = state.replace(params_g=jax.device_get(state.params_g))
    if cfg.data.n_speakers > 1:
        # speaker-embedding projector (reference train_latest.py:257-261)
        emb = np.asarray(state.params_g["emb_g"]["embedding"])
        writer.add_embedding(
            emb, metadata=[str(i) for i in range(cfg.data.n_speakers)],
            global_step=global_step, tag="speaker_embeddings",
        )
    t_eval0 = _time.monotonic()
    infer_jit, recon_jit = _eval_jits(synth)
    item = eval_ds[0]
    x = jnp.asarray(item["x"][None, :])
    x_lengths = jnp.asarray([len(item["x"])], jnp.int32)
    audio_dict = {"gt/audio": item["wav"]}
    # one clip per speaker, like the reference (train_latest.py:299-305);
    # the jitted infer makes this one dispatch per speaker, not hundreds
    sids = (range(cfg.data.n_speakers)
            if cfg.data.n_speakers > 1 else [None])
    item_sid = int(item.get("sid", 0)) if cfg.data.n_speakers > 1 else None
    tts_audio = None  # the synthesis matching the GT item's speaker
    for s in sids:
        sid = jnp.asarray([s], jnp.int32) if s is not None else None
        out = infer_jit(state.params_g, x, x_lengths, sid,
                        jax.random.PRNGKey(global_step))
        n = int(out.y_lengths[0]) * cfg.data.hop_length
        key = f"gen/audio_spk_{s}" if s is not None else "gen/audio"
        audio_dict[key] = np.asarray(out.o[0, :n, 0])
        if s == item_sid:
            tts_audio = audio_dict[key]
    images = {
        "eval/attn": plot_alignment_to_numpy(
            np.asarray(out.attn[0, : int(out.y_lengths[0])])
        )
    }
    # Copy-synthesis fidelity: posterior-encode the GT spectrogram and
    # decode — time-aligned with GT, so MCD/F0/LSD are well-defined
    # objective regression signals (the reference logs audio only,
    # SURVEY.md §4 — this is the gap-fill).
    scalars = {}
    try:
        from mb_istft_vits_tpu.dsp import spectrogram
        from mb_istft_vits_tpu.utils.metrics import (
            f0_metrics, log_spectral_distance, mel_cepstral_distortion)

        gt = np.asarray(item["wav"], np.float32).reshape(-1)
        spec = spectrogram(
            jnp.asarray(gt[None]), cfg.data.filter_length,
            cfg.data.hop_length, cfg.data.win_length,
        ).transpose(0, 2, 1)  # [1, F, bins]
        sid0 = (jnp.asarray([0], jnp.int32)
                if cfg.data.n_speakers > 1 else None)
        recon, _ = recon_jit(state.params_g, spec,
                             jnp.asarray([spec.shape[1]], jnp.int32), sid0,
                             jax.random.PRNGKey(global_step))
        recon = np.asarray(recon[0, :, 0], np.float32)
        sr = cfg.data.sampling_rate
        scalars["eval/mcd_copy_synthesis"] = mel_cepstral_distortion(
            gt, recon, sr, n_fft=cfg.data.filter_length,
            hop_length=cfg.data.hop_length,
            win_length=cfg.data.win_length,
            n_mels=min(cfg.data.n_mel_channels,
                       cfg.data.filter_length // 2 + 1))
        scalars["eval/lsd_copy_synthesis"] = log_spectral_distance(
            gt, recon, sr, n_fft=cfg.data.filter_length,
            hop_length=cfg.data.hop_length,
            win_length=cfg.data.win_length)
        if len(gt) >= 4096:
            f0m = f0_metrics(gt, recon, sr)
            scalars["eval/f0_rmse_hz"] = f0m["f0_rmse_hz"]
            scalars["eval/voicing_decision_error"] = (
                f0m["voicing_decision_error"])
        audio_dict["gen/audio_copy_synthesis"] = recon[: len(gt)]
        # TTS-path objective score (VERDICT r4 #2): the infer output above
        # is the PRODUCT path (text -> duration predictor -> alignment ->
        # flow -> decode, reference models.py:697-737) — score it against
        # GT with DTW-aligned MCD (it carries its own timing) plus the
        # predicted/GT duration ratio. Copy-synthesis proves the vocoder
        # tail; this proves the system.
        if tts_audio is not None and len(tts_audio) > 0:
            from mb_istft_vits_tpu.utils.metrics import mcd_dtw

            t = mcd_dtw(
                gt, np.asarray(tts_audio, np.float32), sr,
                n_fft=cfg.data.filter_length,
                hop_length=cfg.data.hop_length,
                win_length=cfg.data.win_length,
                n_mels=min(cfg.data.n_mel_channels,
                           cfg.data.filter_length // 2 + 1))
            scalars["eval/mcd_tts_dtw"] = t["mcd_dtw"]
            scalars["eval/dur_ratio_tts"] = t["dur_ratio"]
    except Exception:
        logger.exception("eval: copy-synthesis metrics failed")
    summarize(writer, global_step, scalars=scalars, images=images,
              audios=audio_dict,
              audio_sampling_rate=cfg.data.sampling_rate)
    if scalars:
        logger.info(
            "eval: %s", "  ".join(f"{k.split('/')[-1]}={v:.3f}"
                                  for k, v in scalars.items()))
    logger.info("eval: wrote %d audio clips in %.2fs", len(audio_dict),
                _time.monotonic() - t_eval0)
    return scalars


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="JSON config (reference schema)")
    parser.add_argument("-m", "--model", type=str, required=True,
                        help="Model name (logs/<name>)")
    parser.add_argument("--max-steps", type=int, default=0,
                        help="stop after N steps (0 = epochs from config)")
    parser.add_argument("--reset-optimizer", action="store_true",
                        help="restore model weights but NOT optimizer state "
                             "and re-seed the lr schedule (the reference's "
                             "train_latest_fixed.py:117-128 behavior)")
    parser.add_argument("--host-spec", action="store_true",
                        help="compute linear spectrograms on the host with "
                             "a .spec.npy cache (the reference pipeline, "
                             "data_utils.py:78-86) instead of the default "
                             "on-device spectrogram with int16 PCM feeding")
    parser.add_argument("--aot-cache", type=str, default=None, metavar="DIR",
                        help="persist the compiled train executables under "
                             "DIR: relaunches and preemption resumes load "
                             "them in seconds instead of re-paying the "
                             "multi-minute XLA cold compile (single-device: "
                             "utils/aot.py serialized executables; "
                             "multi-device: the XLA persistent compilation "
                             "cache under DIR/xla)")
    parser.add_argument("--boundaries", type=str, default=None,
                        metavar="F0,F1,...",
                        help="bucket boundaries in spec frames (default: the "
                             "reference's 32,300,...,1000, train_latest.py:79"
                             "-84). Fewer buckets = fewer compiled programs "
                             "(2 per bucket) at the cost of more padding "
                             "waste; useful to bound XLA cold-start time")
    parser.add_argument("--debug-nans", action="store_true",
                        help="raise on NaN/Inf in jitted computations "
                             "(the reference's always-on "
                             "set_detect_anomaly, train_latest.py:40)")
    parser.add_argument("--device-resident", action="store_true",
                        help="upload the whole bucket-padded corpus to "
                             "device HBM once and assemble batches with "
                             "an on-device gather — only a [batch]-int32 "
                             "index vector crosses host->device per "
                             "step. Removes the feed-bandwidth ceiling "
                             "entirely for corpora that fit HBM "
                             "(int16 PCM: ~0.16 GB/h at 22.05 kHz). "
                             "Implies the default device-spec feeding; "
                             "multi-host runs replicate the pools per "
                             "host and gather with a global index "
                             "vector (no input bytes cross hosts)")
    args = parser.parse_args()

    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    import jax
    import numpy as np

    if args.aot_cache:
        # the XLA persistent compilation cache handles every topology
        # (multi-device SPMD executables round-trip through it, unlike the
        # single-device AotCache below); set it before anything compiles
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(args.aot_cache, "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.data import (
        BucketedBatcher,
        TextAudioDataset,
        device_prefetch,
        prefetch_epoch,
    )
    from mb_istft_vits_tpu.parallel import create_mesh, shard_batch
    from mb_istft_vits_tpu.train import create_train_state, make_train_step
    from mb_istft_vits_tpu.train.checkpoint import (
        best_checkpoint_step,
        latest_checkpoint_step,
        load_checkpoint,
        prune_checkpoints,
        record_best_checkpoint,
        save_checkpoint,
    )

    model_dir = os.path.join("./logs", args.model)
    os.makedirs(model_dir, exist_ok=True)
    is_rank0 = jax.process_index() == 0
    logger = get_logger(model_dir) if is_rank0 else logging.getLogger("null")
    if is_rank0:
        check_git_hash(model_dir, logger)
        # snapshot config (reference utils.py:172-177)
        with open(args.config) as f:
            cfg_text = f.read()
        with open(os.path.join(model_dir, "config.json"), "w") as f:
            f.write(cfg_text)

    cfg = Config.from_json(args.config)
    dataset = TextAudioDataset(cfg.data.training_files, cfg.data,
                               seed=cfg.train.seed,
                               device_spec=not args.host_spec)
    n_hosts = jax.process_count()
    bucket_kw = {}
    if args.boundaries:
        bucket_kw["boundaries"] = [int(v) for v in
                                   args.boundaries.split(",")]
    batcher = BucketedBatcher(
        dataset, cfg.train.batch_size, num_replicas=n_hosts,
        rank=jax.process_index(), **bucket_kw,
    )
    steps_per_epoch = len(batcher)
    if steps_per_epoch == 0:
        raise ValueError(
            f"dataset produced 0 batches ({len(dataset)} usable rows in "
            f"{cfg.data.training_files}, batch_size "
            f"{cfg.train.batch_size} x {n_hosts} hosts) — every row was "
            f"filtered (text-length gate / bucket range) or the filelist "
            f"is too small")
    import dataclasses

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train,
                                       steps_per_epoch=steps_per_epoch))
    if is_rank0:
        logger.info("dataset: %d utts, %d steps/epoch", len(dataset),
                    steps_per_epoch)

    mesh = create_mesh()
    feeder = None
    if args.device_resident:
        if args.host_spec:
            logger.warning(
                "--device-resident requires device-spec feeding — "
                "falling back to host feeding")
        else:
            from mb_istft_vits_tpu.data import DeviceResidentFeeder

            est = DeviceResidentFeeder.corpus_bytes(batcher)
            logger.info("device-resident corpus: uploading ~%.2f GB of "
                        "bucket-padded pools to HBM", est / 1e9)
            feeder = DeviceResidentFeeder(batcher, mesh=mesh,
                                          logger=logger)
    first_batch = next(batcher.iter_epoch(0))
    state, synth, disc = create_train_state(
        cfg, jax.random.PRNGKey(cfg.train.seed),
        jax.tree.map(lambda a: a[:2], first_batch),
    )

    if args.debug_nans:
        from mb_istft_vits_tpu.utils import enable_nan_debugging

        enable_nan_debugging()

    start_step = latest_checkpoint_step(model_dir)
    if start_step is not None:
        restored = load_checkpoint(model_dir, start_step, state)
        if args.reset_optimizer:
            # train_latest_fixed semantics: weights only, fresh optimizer,
            # lr schedule re-seeded by keeping step for data order but
            # restarting optimizer moments (reference
            # train_latest_fixed.py:117-128)
            state = state.replace(params_g=restored.params_g,
                                  params_d=restored.params_d,
                                  step=restored.step)
        else:
            state = restored
        # reference resume semantics (train_latest.py:116-122 + epoch
        # loop): training restarts at the last finished epoch's boundary.
        # Keeping a mid-epoch step while replaying the epoch's data from
        # its start would drift step/epoch accounting (and the lr
        # schedule) further on every preemption resume — snap down.
        snapped = (int(restored.step) // max(steps_per_epoch, 1)) \
            * max(steps_per_epoch, 1)
        if snapped != int(state.step):
            import jax.numpy as jnp

            from mb_istft_vits_tpu.train.step import retime_opt_state

            # snap the optimizer's internal counts too (lr schedule +
            # adam bias correction) — the restored counts hold the
            # unsnapped step, and replaying the epoch would leave them
            # permanently ahead of state.step, drifting the applied lr
            # on every preemption resume
            state = state.replace(
                step=jnp.asarray(snapped, state.step.dtype),
                opt_state_g=retime_opt_state(state.opt_state_g, snapped),
                opt_state_d=retime_opt_state(state.opt_state_d, snapped),
            )
        if is_rank0:
            logger.info("resumed from step %d%s%s", start_step,
                        f" (snapped to epoch boundary {snapped})"
                        if snapped != start_step else "",
                        " (optimizer reset)" if args.reset_optimizer else "")

    aot_cache = None
    if args.aot_cache:
        from mb_istft_vits_tpu.utils.aot import AotCache

        if AotCache.usable():
            aot_cache = AotCache(args.aot_cache)
            if is_rank0:
                logger.info("aot: caching train executables under %s",
                            args.aot_cache)
        elif is_rank0:
            logger.info("aot: multi-device runtime — executable cache via "
                        "the XLA persistent compilation cache at %s",
                        os.path.join(args.aot_cache, "xla"))
    step_fn = make_train_step(cfg, synth, disc, aot_cache=aot_cache)

    writer = None
    if is_rank0:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(log_dir=model_dir)
        except ImportError:
            pass

    # Preemption safety (beyond the reference, which only has
    # resume-on-restart): TPU VMs get SIGTERM on preemption — checkpoint
    # at the next step boundary and exit cleanly so resume loses nothing.
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    signal.signal(signal.SIGTERM, _on_sigterm)

    global_step = int(state.step)
    # --reset-optimizer restarts adamw's internal schedule count at 0
    # while state.step is preserved (the reference's re-seeded initial_lr,
    # train_latest_fixed.py:117-128) — offset the *logged* lr to match
    # the lr actually applied
    lr_offset = global_step if (args.reset_optimizer
                                and start_step is not None) else 0
    from mb_istft_vits_tpu.train.step import make_lr_schedule

    from mb_istft_vits_tpu.train.checkpoint import (
        wait_for_pending_checkpoint,
    )
    import atexit

    atexit.register(wait_for_pending_checkpoint)  # async saves finalize

    lr_schedule = make_lr_schedule(cfg)
    eval_ds = make_eval_dataset(cfg, logger) if is_rank0 else None

    # best-by-eval tracker, resumed across relaunches from ckpt/best.json
    prev_best = best_checkpoint_step(model_dir) if is_rank0 else None
    best_eval = {"step": (prev_best or {}).get("step"),
                 "value": (prev_best or {}).get("value")}

    def preempt_agreed() -> bool:
        """Multi-host: hosts must AGREE on when to enter the collective
        checkpoint save — preemption SIGTERMs land milliseconds apart,
        and one host entering save(N) while another dispatches step N+1's
        all-reduce deadlocks the job. A max-allgather of the local flag
        each step keeps every host on the same decision (single-host:
        just the local flag, no collective)."""
        if n_hosts == 1:
            return preempted["flag"]
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(preempted["flag"], np.int32))
        return bool(np.max(flags))

    t_last = time.perf_counter()
    epoch0 = global_step // max(steps_per_epoch, 1)
    for epoch in range(epoch0, cfg.train.epochs):
        # loader-thread prefetch overlaps batch assembly (wav read + native
        # spectrogram) with the device step — the reference's
        # DataLoader(num_workers=8) role (train_latest.py:85) — and
        # device_prefetch double-buffers the H2D transfer so batch i+1
        # is already on device while step i runs (the reference's
        # pin_memory + async CUDA copy role)
        if feeder is not None:
            # device-resident: batches are gathered in HBM; the only
            # per-step H2D is the index vector (see data/resident.py)
            batch_iter = feeder.iter_epoch(epoch)
        else:
            batch_iter = device_prefetch(
                prefetch_epoch(batcher, epoch, num_workers=8),
                lambda b: shard_batch(b, mesh))
        for sharded in batch_iter:
            state, metrics = step_fn(state, sharded)
            global_step += 1
            if is_rank0 and global_step % cfg.train.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                if lr_offset:
                    m["learning_rate"] = float(
                        lr_schedule(global_step - 1 - lr_offset))
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                m["steps_per_sec"] = cfg.train.log_interval / dt
                logger.info("step %d: %s", global_step,
                            json.dumps({k: round(v, 5) for k, v in
                                        m.items()}))
                if writer:
                    for k, v in m.items():
                        writer.add_scalar(k, v, global_step)
            if global_step % cfg.train.eval_interval == 0:
                eval_scalars = None
                if is_rank0:
                    eval_scalars = evaluate(cfg, synth, state, writer,
                                            global_step, logger, eval_ds)
                # orbax save is a COLLECTIVE under multi-host (barrier +
                # distributed array gather): every process must enter it,
                # or rank 0 deadlocks against ranks already in the next
                # step's all-reduce
                # async: the file write overlaps the next train steps
                save_checkpoint(model_dir, global_step, state, wait=False)
                if is_rank0:
                    logger.info("saved checkpoint at %d", global_step)
                    # best-by-eval tracking: a run that ends inside a
                    # GAN-dominant episode (r4's 120-140k MCD-24 window)
                    # must never ship only the damaged latest weights
                    mcd = (eval_scalars or {}).get(
                        "eval/mcd_copy_synthesis")
                    if mcd is not None and (
                            best_eval["value"] is None
                            or mcd < best_eval["value"]):
                        best_eval.update(step=global_step, value=mcd)
                        record_best_checkpoint(
                            model_dir, global_step,
                            "eval/mcd_copy_synthesis", mcd)
                        logger.info("best checkpoint: step %d "
                                    "(mcd_copy_synthesis %.3f)",
                                    global_step, mcd)
                    keep = ((best_eval["step"],)
                            if best_eval["step"] is not None else ())
                    pruned = prune_checkpoints(model_dir, keep_steps=keep)
                    if pruned:
                        logger.info("pruned checkpoints: %s", pruned)
            if preempt_agreed():
                save_checkpoint(model_dir, global_step, state)
                if is_rank0:
                    logger.info(
                        "SIGTERM: checkpointed at step %d, exiting",
                        global_step,
                    )
                return
            if args.max_steps and global_step >= args.max_steps:
                save_checkpoint(model_dir, global_step, state)
                return


if __name__ == "__main__":
    main()
