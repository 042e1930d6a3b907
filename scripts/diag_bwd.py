#!/usr/bin/env python
"""Honest backward-pass bisection: every timing fetches a reduction of the
GRADIENTS (so XLA cannot DCE the backward)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, fn, *args, n=2):
    import jax

    t0 = time.perf_counter()
    float(jax.device_get(fn(*args)))
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        float(jax.device_get(fn(*args)))
    run_t = (time.perf_counter() - t0) / n
    print(f"{name:32s} compile {compile_t:7.1f}s   run {run_t*1e3:9.1f} ms",
          flush=True)


def gsum(tree):
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(tree))


def main():
    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.losses import feature_loss
    from mb_istft_vits_tpu.models import Synthesizer
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

    ds = DiscriminatorS()
    ds_params = ds.init(jax.random.PRNGKey(0), y)

    @jax.jit
    def ds_bwd(p):
        g = jax.grad(lambda q: jnp.sum(ds.apply(q, y)[0] ** 2))(p)
        return gsum(g)

    bench("DiscS bwd(params)", ds_bwd, ds_params)

    @jax.jit
    def ds_bwd_in(yy):
        g = jax.grad(lambda z: jnp.sum(ds.apply(ds_params, z)[0] ** 2))(yy)
        return jnp.sum(g)

    bench("DiscS bwd(input)", ds_bwd_in, y)

    dp = DiscriminatorP(period=2)
    dp_params = dp.init(jax.random.PRNGKey(0), y)

    @jax.jit
    def dp_bwd(p):
        g = jax.grad(lambda q: jnp.sum(dp.apply(q, y)[0] ** 2))(p)
        return gsum(g)

    bench("DiscP2 bwd(params)", dp_bwd, dp_params)

    def g_fwd(p, loss_slice):
        out = synth.apply({"params": p}, batch["x"], batch["x_lengths"],
                          batch["spec"], batch["spec_lengths"], train=True,
                          rngs=rngs)
        return out

    @jax.jit
    def g_bwd_dec(p):
        g = jax.grad(lambda q: jnp.mean(
            jnp.abs(g_fwd(q, None)[0].astype(jnp.float32))))(p)
        return gsum(g)

    bench("G bwd via y_hat (decoder path)", g_bwd_dec, state.params_g)

    @jax.jit
    def g_bwd_durkl(p):
        def loss(q):
            out = g_fwd(q, None)
            l_length = out[2]
            z, z_p, m_p, logs_p, m_q, logs_q = out[7]
            from mb_istft_vits_tpu.losses import kl_loss

            return (jnp.sum(l_length.astype(jnp.float32))
                    + kl_loss(z_p, logs_q, m_p, logs_p, out[6]))

        return gsum(jax.grad(loss)(p))

    bench("G bwd via dur+kl (enc/flow)", g_bwd_durkl, state.params_g)

    @jax.jit
    def fm_bwd(yy):
        def loss(z):
            _, _, fr, fg = disc.apply({"params": state.params_d}, y, z)
            return feature_loss(fr, fg)

        return jnp.sum(jax.grad(loss)(yy))

    bench("fm bwd(input through MPD)", fm_bwd, y * 0.9)

    from mb_istft_vits_tpu.dsp.mel import mel_spectrogram

    @jax.jit
    def mel_bwd(yy):
        g = jax.grad(lambda z: jnp.mean(mel_spectrogram(
            z[..., 0], 1024, 80, 22050, 256, 1024, 0.0, None)))(yy)
        return jnp.sum(g)

    bench("mel bwd(input)", mel_bwd, y)

    from mb_istft_vits_tpu.losses import subband_stft_loss

    y_mb = jnp.asarray(rng.randn(b, seg // 4, 4).astype(np.float32))

    @jax.jit
    def sub_bwd(z):
        g = jax.grad(lambda w: subband_stft_loss(
            y_mb, w, cfg.train.fft_sizes, cfg.train.hop_sizes,
            cfg.train.win_lengths))(z)
        return jnp.sum(g)

    bench("subband bwd(input)", sub_bwd, y_mb * 0.9)


if __name__ == "__main__":
    main()
