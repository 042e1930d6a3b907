#!/usr/bin/env python
"""Bisect the generator loss composition at full size (honest device_get
timing)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, fn, *args, n=2):
    import jax

    t0 = time.perf_counter()
    jax.device_get(fn(*args))
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        jax.device_get(fn(*args))
    run_t = (time.perf_counter() - t0) / n
    print(f"{name:32s} compile {compile_t:7.1f}s   run {run_t*1e3:9.1f} ms",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.dsp.mel import mel_spectrogram, spec_to_mel
    from mb_istft_vits_tpu.losses import (
        feature_loss,
        generator_loss,
        kl_loss,
        subband_stft_loss,
    )
    from mb_istft_vits_tpu.models import MultiPeriodDiscriminator, Synthesizer
    from mb_istft_vits_tpu.ops import slice_segments
    from mb_istft_vits_tpu.train import create_train_state

    cfg = Config.from_json("configs/ljs_mb_istft_vits.json")
    b, t_x, t_spec = 32, 192, 400
    d = cfg.data
    t = cfg.train
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
    seg_frames = t.segment_size // d.hop_length

    def fwd(p):
        return synth.apply({"params": p}, batch["x"], batch["x_lengths"],
                           batch["spec"], batch["spec_lengths"], train=True,
                           rngs=rngs)

    def make_loss(terms):
        def loss_fn(p):
            (y_hat, y_hat_mb, l_length, attn, ids_slice, x_mask, z_mask,
             latents) = fwd(p)
            z, z_p, m_p, logs_p, m_q, logs_q = latents
            total = 0.0
            if "dur" in terms:
                total += jnp.sum(l_length.astype(jnp.float32))
            if "kl" in terms:
                total += kl_loss(z_p, logs_q, m_p, logs_p, z_mask) * t.c_kl
            if "mel" in terms:
                mel = spec_to_mel(jnp.swapaxes(batch["spec"], 1, 2),
                                  d.filter_length, d.n_mel_channels,
                                  d.sampling_rate, d.mel_fmin, d.mel_fmax)
                y_mel = slice_segments(jnp.swapaxes(mel, 1, 2), ids_slice,
                                       seg_frames)
                y_hat_mel = mel_spectrogram(
                    y_hat[..., 0].astype(jnp.float32), d.filter_length,
                    d.n_mel_channels, d.sampling_rate, d.hop_length,
                    d.win_length, d.mel_fmin, d.mel_fmax)
                total += jnp.mean(jnp.abs(jnp.swapaxes(y_mel, 1, 2)
                                          - y_hat_mel)) * t.c_mel
            if "adv" in terms or "fm" in terms:
                y = slice_segments(batch["wav"], ids_slice * d.hop_length,
                                   t.segment_size)
                y_d_r, y_d_g, fr, fg = disc.apply(
                    {"params": state.params_d}, y, y_hat)
                if "adv" in terms:
                    total += generator_loss(y_d_g)[0]
                if "fm" in terms:
                    total += feature_loss(fr, fg)
            if "sub" in terms:
                from mb_istft_vits_tpu.dsp.pqmf import PQMFBank

                y = slice_segments(batch["wav"], ids_slice * d.hop_length,
                                   t.segment_size)
                pqmf = PQMFBank(subbands=cfg.model.subbands)
                y_mb = pqmf.analysis(y.astype(jnp.float32))
                total += subband_stft_loss(y_mb, y_hat_mb, t.fft_sizes,
                                           t.hop_sizes, t.win_lengths)
            return total

        return jax.jit(lambda p: jax.value_and_grad(loss_fn)(p)[0])

    bench("grad: dur+kl", make_loss({"dur", "kl"}), state.params_g)
    bench("grad: mel", make_loss({"mel"}), state.params_g)
    bench("grad: adv+fm", make_loss({"adv", "fm"}), state.params_g)
    bench("grad: sub", make_loss({"sub"}), state.params_g)
    bench("grad: ALL", make_loss({"dur", "kl", "mel", "adv", "fm", "sub"}),
          state.params_g)


if __name__ == "__main__":
    main()
