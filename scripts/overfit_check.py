#!/usr/bin/env python
"""Overfit sanity check (SURVEY.md §7 minimum slice): train the tiny MB
config on one fixed synthetic batch and verify the mel reconstruction loss
drops substantially — proves gradients flow end-to-end through MAS,
flows, decoder, and both GAN updates."""

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
    parser.add_argument("--steps", type=int, default=150)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mb_istft_vits_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from mb_istft_vits_tpu.dsp import spectrogram
    from mb_istft_vits_tpu.train import create_train_state, make_train_step

    model = ModelConfig(
        n_vocab=40, spec_channels=129, segment_size=16,
        inter_channels=32, hidden_channels=32, filter_channels=64,
        n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.0,
        resblock="2", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        upsample_rates=(2, 2), upsample_initial_channel=64,
        upsample_kernel_sizes=(4, 4), gen_istft_n_fft=16,
        gen_istft_hop_size=4, subbands=4, mb_istft_vits=True,
    )
    data = DataConfig(filter_length=256, hop_length=64, win_length=256,
                      n_mel_channels=20, sampling_rate=8000)
    train = TrainConfig(batch_size=8, segment_size=1024, learning_rate=5e-4,
                        fft_sizes=(64, 128), hop_sizes=(16, 32),
                        win_lengths=(64, 128), steps_per_epoch=1000)
    cfg = Config(model=model, data=data, train=train)

    rng = np.random.RandomState(0)
    b, t_x, t_wav = 8, 16, 4096
    # synthetic "speech": sums of a few stable sinusoids per utterance
    t = np.arange(t_wav) / data.sampling_rate
    wav = np.stack([
        sum(0.2 * np.sin(2 * np.pi * f * t)
            for f in rng.uniform(100, 1500, 3))
        for _ in range(b)
    ]).astype(np.float32)
    spec = np.asarray(spectrogram(jnp.asarray(wav), 256, 64, 256))
    batch = {
        "x": jnp.asarray(rng.randint(1, 40, size=(b, t_x)).astype(np.int32)),
        "x_lengths": jnp.asarray(np.full(b, t_x, np.int32)),
        "spec": jnp.asarray(spec.transpose(0, 2, 1)),
        "spec_lengths": jnp.asarray(np.full(b, spec.shape[2], np.int32)),
        "wav": jnp.asarray(wav)[..., None],
        "wav_lengths": jnp.asarray(np.full(b, t_wav, np.int32)),
    }
    state, synth, disc = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, synth, disc)

    first_mel = None
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, batch)
        if i == 0:
            first_mel = float(metrics["loss/g/mel"])
            print(f"compile+step0: {time.perf_counter()-t0:.1f}s  "
                  f"mel={first_mel:.3f}")
        if (i + 1) % 25 == 0:
            print(f"step {i+1}: mel={float(metrics['loss/g/mel']):.3f} "
                  f"dur={float(metrics['loss/g/dur']):.3f} "
                  f"kl={float(metrics['loss/g/kl']):.3f} "
                  f"d={float(metrics['loss/d/total']):.3f}")
    last_mel = float(metrics["loss/g/mel"])
    print(f"mel loss: {first_mel:.3f} -> {last_mel:.3f}")
    assert last_mel < 0.7 * first_mel, "mel loss did not drop enough"
    print("OVERFIT CHECK PASSED")


if __name__ == "__main__":
    main()
