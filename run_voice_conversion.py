#!/usr/bin/env python
"""Voice conversion CLI: re-speak a reference wav in a target speaker's
voice via the latent flow (reference models.py:790-798)."""

import argparse

import numpy as np

from run_synthesis import write_wav


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-k", "--checkpoint", default=None)
    parser.add_argument("-i", "--input-wav", required=True)
    parser.add_argument("--sid-src", type=int, required=True)
    parser.add_argument("--sid-tgt", type=int, required=True)
    parser.add_argument("-o", "--output", default="converted.wav")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.data.dataset import load_wav
    from mb_istft_vits_tpu.dsp import spectrogram
    from mb_istft_vits_tpu.infer import get_synthesis_module_instance
    from mb_istft_vits_tpu.models import Synthesizer

    module = get_synthesis_module_instance(args.config, args.checkpoint)
    d = module.data_cfg
    audio, sr = load_wav(args.input_wav)
    assert sr == d.sampling_rate, (sr, d.sampling_rate)
    audio = audio / d.max_wav_value
    spec = spectrogram(jnp.asarray(audio[None, :]), d.filter_length,
                       d.hop_length, d.win_length)
    spec = jnp.swapaxes(spec, 1, 2)  # [1, F, bins]
    y_lengths = jnp.asarray([spec.shape[1]], jnp.int32)

    o_hat, o_hat_mb, y_mask, _ = module.model.apply(
        {"params": module.params}, spec, y_lengths,
        jnp.asarray([args.sid_src], jnp.int32),
        jnp.asarray([args.sid_tgt], jnp.int32),
        method=Synthesizer.voice_conversion,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    out = np.asarray(o_hat[0, :, 0])
    write_wav(args.output, out, module.sampling_rate)
    print(f"wrote {args.output} ({len(out) / sr:.2f}s)")


if __name__ == "__main__":
    main()
