#!/usr/bin/env python
"""Proper train-step bisection: on the axon platform block_until_ready does
NOT wait for completion, so every stage is timed with jax.device_get of a
scalar reduction of its outputs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, fn, *args, n=2):
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.device_get(fn(*args)))
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        v = float(jax.device_get(fn(*args)))
    run_t = (time.perf_counter() - t0) / n
    print(f"{name:32s} compile {compile_t:7.1f}s   run {run_t*1e3:9.1f} ms",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.losses import (
        discriminator_loss,
        feature_loss,
        generator_loss,
        subband_stft_loss,
    )
    from mb_istft_vits_tpu.models import MultiPeriodDiscriminator, Synthesizer
    from mb_istft_vits_tpu.models.discriminator import (
        DiscriminatorP,
        DiscriminatorS,
    )
    from mb_istft_vits_tpu.train import create_train_state

    cfg = Config.from_json("configs/ljs_mb_istft_vits.json")
    b, t_x, t_spec = 32, 192, 400
    rng = np.random.RandomState(0)
    batch = {
        "x": jnp.asarray(rng.randint(1, cfg.model.n_vocab,
                                     size=(b, t_x)).astype(np.int32)),
        "x_lengths": jnp.asarray(np.full(b, t_x, np.int32)),
        "spec": jnp.asarray((rng.randn(b, t_spec, 513) ** 2)
                            .astype(np.float32)),
        "spec_lengths": jnp.asarray(np.full(b, t_spec, np.int32)),
        "wav": jnp.asarray(rng.uniform(-0.5, 0.5, (b, t_spec * 256, 1))
                           .astype(np.float32)),
        "wav_lengths": jnp.asarray(np.full(b, t_spec * 256, np.int32)),
    }
    state, synth, disc = create_train_state(
        cfg, jax.random.PRNGKey(0), jax.tree.map(lambda a: a[:2], batch))
    rngs = {"noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "slice": jax.random.PRNGKey(3)}

    seg = cfg.train.segment_size
    y = batch["wav"][:, :seg, :]
    y_fake = jnp.asarray(rng.uniform(-0.5, 0.5, (b, seg, 1))
                         .astype(np.float32))

    # --- discriminator pieces -----------------------------------------
    ds = DiscriminatorS()
    ds_params = ds.init(jax.random.PRNGKey(0), y)

    @jax.jit
    def ds_fwd(p):
        out, fm = ds.apply(p, y)
        return jnp.sum(out)

    bench("DiscS fwd", ds_fwd, ds_params)

    @jax.jit
    def ds_bwd(p):
        return jax.value_and_grad(
            lambda q: jnp.sum(ds.apply(q, y)[0] ** 2))(p)[0]

    bench("DiscS fwd+bwd", ds_bwd, ds_params)

    dp = DiscriminatorP(period=11)
    dp_params = dp.init(jax.random.PRNGKey(0), y)

    @jax.jit
    def dp_bwd(p):
        return jax.value_and_grad(
            lambda q: jnp.sum(dp.apply(q, y)[0] ** 2))(p)[0]

    bench("DiscP11 fwd+bwd", dp_bwd, dp_params)

    @jax.jit
    def d_all_bwd(p):
        def loss(q):
            y_d_r, y_d_g, _, _ = disc.apply({"params": q}, y, y_fake)
            return discriminator_loss(y_d_r, y_d_g)[0]

        return jax.value_and_grad(loss)(state.params_d)[0]

    bench("MPD all fwd+bwd", d_all_bwd, state.params_d)

    # --- generator pieces ----------------------------------------------
    @jax.jit
    def g_fwd(p):
        out = synth.apply({"params": p}, batch["x"], batch["x_lengths"],
                          batch["spec"], batch["spec_lengths"], train=True,
                          rngs=rngs)
        return jnp.sum(out[0].astype(jnp.float32))

    bench("G fwd", g_fwd, state.params_g)

    @jax.jit
    def g_bwd(p):
        def loss(q):
            out = synth.apply({"params": q}, batch["x"], batch["x_lengths"],
                              batch["spec"], batch["spec_lengths"],
                              train=True, rngs=rngs)
            return jnp.mean(jnp.abs(out[0].astype(jnp.float32)))

        return jax.value_and_grad(loss)(p)[0]

    bench("G fwd+bwd (l1)", g_bwd, state.params_g)

    # --- losses on fixed tensors ----------------------------------------
    y_mb = jnp.asarray(rng.randn(b, seg // 4, 4).astype(np.float32))

    @jax.jit
    def sub_bwd(y_hat_mb):
        return jax.value_and_grad(
            lambda z: subband_stft_loss(y_mb, z, cfg.train.fft_sizes,
                                        cfg.train.hop_sizes,
                                        cfg.train.win_lengths))(y_hat_mb)[0]

    bench("subband MR-STFT fwd+bwd", sub_bwd, y_mb + 0.01)

    @jax.jit
    def fm_bwd(y_hat):
        def loss(z):
            _, _, fr, fg = disc.apply({"params": state.params_d}, y, z)
            return feature_loss(fr, fg)

        return jax.value_and_grad(loss)(y_hat)[0]

    bench("feature-matching fwd+bwd", fm_bwd, y_fake)

    from mb_istft_vits_tpu.dsp.mel import mel_spectrogram

    @jax.jit
    def mel_bwd(y_hat):
        return jax.value_and_grad(lambda z: jnp.mean(mel_spectrogram(
            z[..., 0], 1024, 80, 22050, 256, 1024, 0.0, None)))(y_hat)[0]

    bench("mel-loss fwd+bwd", mel_bwd, y_fake)

    # --- MAS alone -------------------------------------------------------
    from mb_istft_vits_tpu.ops.mas import maximum_path

    nc = jnp.asarray(rng.randn(b, t_spec, t_x).astype(np.float32))
    m = jnp.ones((b, t_spec, t_x), jnp.float32)

    @jax.jit
    def mas_pallas(ncent):
        return jnp.sum(maximum_path(ncent, m, use_pallas=True))

    bench("MAS pallas", mas_pallas, nc)

    @jax.jit
    def mas_scan(ncent):
        return jnp.sum(maximum_path(ncent, m, use_pallas=False))

    bench("MAS scan", mas_scan, nc)


if __name__ == "__main__":
    main()
