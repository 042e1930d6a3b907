"""Waveform decoders: iSTFT / Multiband-iSTFT / Multistream-iSTFT heads.

Behavior contract: reference `models.py:248-475`. Shared trunk:
conv_pre -> [ConvTranspose upsample -> mean of N ResBlock1] ×L -> leaky_relu
-> ReflectionPad(1,0) -> conv_post, then an exp/π·sin spec-phase
parameterization feeding an inverse STFT (per band for MB/MS).

TPU-first changes vs the reference:
  - TorchSTFT/PQMF are *not* constructed per forward call
    (reference models.py:345-346,431 quirk) — the iSTFT basis and PQMF
    filters are trace-time constants.
  - the MS generator's post conv input width is parameterized by `subbands`
    (reference models.py:425 hardcodes 4).
  - waveforms are [B, T, C] channels-last.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.dsp.pqmf import PQMFBank
from mb_istft_vits_tpu.dsp.stft import istft_riq
from mb_istft_vits_tpu.nn import Conv1d, ConvTranspose1d, ResBlock1, ResBlock2
from mb_istft_vits_tpu.nn.layers import get_padding, leaky_relu


class _UpsamplerTrunk(nn.Module):
    """conv_pre + upsample/resblock stack shared by all decoder heads
    (reference models.py:278-291 et al).

    Init note: the reference calls .apply(init_weights) (N(0, 0.01)) on
    its weight-normed convs, but that writes the DERIVED weight tensor,
    which the weight_norm pre-forward hook recomputes from the untouched
    (v, g) on the first forward — the 0.01 init is a no-op there
    (verified in torch: weight std 0.01 after init, kaiming-level after
    one forward). The effective reference init is therefore the default
    kaiming-uniform on v with g = ||v||, which is exactly what these
    layers use — do NOT "fix" this by re-adding a 0.01 init."""

    initial_channel: int
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 g: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        num_kernels = len(self.resblock_kernel_sizes)
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        x = Conv1d(self.upsample_initial_channel, 7, padding=3,
                   weight_norm=True, name="conv_pre")(x)
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            x = leaky_relu(x)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1d(
                ch, k, stride=u, padding=(k - u) // 2, weight_norm=True,
                name=f"ups_{i}",
            )(x)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                y = res_cls(ch, rk, tuple(rd), gin_channels=self.gin_channels,
                            name=f"resblocks_{i * num_kernels + j}")(x, g=g)
                xs = y if xs is None else xs + y
            x = xs / num_kernels
        return leaky_relu(x, 0.01)  # F.leaky_relu default slope (models.py:291)


def _spec_phase(x: jnp.ndarray, n_fft: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """exp-magnitude / π·sin-phase head (reference models.py:294-295)."""
    n_bins = n_fft // 2 + 1
    spec = jnp.exp(x[..., :n_bins])
    phase = math.pi * jnp.sin(x[..., n_bins:])
    return spec, phase


def _reflection_pad_left1(x: jnp.ndarray) -> jnp.ndarray:
    """torch ReflectionPad1d((1, 0)) on time (reference models.py:276)."""
    return jnp.concatenate([x[:, 1:2, :], x], axis=1)


def _riq(spec: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    """mag/phase -> frames-last (real‖imag) on the trailing axis, the
    native input layout of `istft_riq` — the heads emit frames on the
    time axis already, so no bins<->frames transposes are needed."""
    return jnp.concatenate(
        [spec * jnp.cos(phase), spec * jnp.sin(phase)], axis=-1
    )


class ISTFTGenerator(nn.Module):
    """Single full-band iSTFT head (reference models.py:248-306)."""

    initial_channel: int
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gen_istft_n_fft: int
    gen_istft_hop_size: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, g=None):
        x = _UpsamplerTrunk(
            self.initial_channel, self.resblock, self.resblock_kernel_sizes,
            self.resblock_dilation_sizes, self.upsample_rates,
            self.upsample_initial_channel, self.upsample_kernel_sizes,
            self.gin_channels, name="trunk",
        )(x, g=g)
        x = _reflection_pad_left1(x)
        x = Conv1d(self.gen_istft_n_fft + 2, 7, padding=3, weight_norm=True,
                   name="conv_post")(x)
        spec, phase = _spec_phase(x, self.gen_istft_n_fft)
        return self.spec_tail(spec, phase), None, spec, phase  # [B, T, 1]

    def spec_tail(self, spec, phase):
        """(spec, phase) [B, F, bins] -> waveform [B, T, 1]: the head's
        back half, exposed so the serving spec-domain join
        (infer/synthesis.py decode_spec_join) runs the SAME code instead
        of a copy (reference models.py:294-296)."""
        o = istft_riq(_riq(spec, phase), self.gen_istft_n_fft,
                      self.gen_istft_hop_size, self.gen_istft_n_fft)
        return o[..., None]


class _SubbandISTFTBase(nn.Module):
    """Shared trunk + per-band iSTFT for MB/MS generators
    (reference models.py:344-373,430-461)."""

    initial_channel: int
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gen_istft_n_fft: int
    gen_istft_hop_size: int
    subbands: int = 4
    gin_channels: int = 0

    def _subband_waveforms(self, x, g):
        n_fft, s = self.gen_istft_n_fft, self.subbands
        x = _UpsamplerTrunk(
            self.initial_channel, self.resblock, self.resblock_kernel_sizes,
            self.resblock_dilation_sizes, self.upsample_rates,
            self.upsample_initial_channel, self.upsample_kernel_sizes,
            self.gin_channels, name="trunk",
        )(x, g=g)
        x = _reflection_pad_left1(x)
        x = Conv1d(s * (n_fft + 2), 7, padding=3, weight_norm=True,
                   name="subband_conv_post")(x)
        b, t, _ = x.shape
        x = x.reshape(b, t, s, n_fft + 2)
        spec, phase = _spec_phase(x, n_fft)  # [B, T, s, bins]
        return self.bands_from_spec(spec, phase), spec, phase

    def bands_from_spec(self, spec, phase):
        """Per-band iSTFT: (spec, phase) [B, F, s, bins] -> BAND-MAJOR
        sub-band waveforms [B, s, T_wav] (reference models.py:366-373,
        455-461; the torch layout is also band-major [B, s, T]).
        Band-major is the istft output's native layout AND what the
        sub-band MR-STFT loss consumes, so no [*, *, s] 4-lane
        transposes appear in the G step (VERDICT.md r2 weak #1b).
        Parameter-free; shared by training/infer forward and the serving
        spec-domain join."""
        n_fft, s = self.gen_istft_n_fft, self.subbands
        b, t = spec.shape[0], spec.shape[1]
        # batch the bands: [B, T, s, 2*bins] -> [B*s, T, 2*bins] frames-last
        riq = _riq(spec, phase).transpose(0, 2, 1, 3).reshape(b * s, t, -1)
        y = istft_riq(riq, n_fft, self.gen_istft_hop_size, n_fft)
        t_wav = y.shape[-1]
        return y.reshape(b, s, t_wav)  # [B, s, T_wav] band-major


class MultibandISTFTGenerator(_SubbandISTFTBase):
    """Per-band iSTFT + fixed PQMF synthesis (reference models.py:309-384)."""

    @nn.compact
    def __call__(self, x, g=None):
        y_mb, spec, phase = self._subband_waveforms(x, g)
        o = self.spec_tail_from_bands(y_mb)  # [B, T_wav*s, 1]
        return o, y_mb, spec, phase  # y_mb band-major [B, s, T_wav]

    def spec_tail_from_bands(self, y_mb):
        """PQMF synthesis from band-major sub-band waveforms."""
        return PQMFBank(subbands=self.subbands).synthesis_bm(y_mb)

    def spec_tail(self, spec, phase):
        """(spec, phase) [B, F, s, bins] -> full-band waveform; the same
        back half the forward pass runs (serving spec-domain join)."""
        return self.spec_tail_from_bands(self.bands_from_spec(spec, phase))


class MultistreamISTFTGenerator(_SubbandISTFTBase):
    """Per-band iSTFT + *trainable* synthesis filters
    (reference models.py:387-474): zero-stuffing ×s upsample (the identity
    updown_filter, models.py:463) then a learned 63-tap conv.

    The synthesis conv is declared in setup() (not inline in the compact
    __call__) so `spec_tail` — the serving spec-domain join's entry —
    binds the SAME parameters."""

    def setup(self):
        self.multistream_conv_post = Conv1d(
            1, 63, padding=get_padding(63, 1), use_bias=False,
            weight_norm=True,
        )

    @nn.compact
    def __call__(self, x, g=None):
        y_mb, spec, phase = self._subband_waveforms(x, g)
        up = self._zero_stuff(y_mb)
        o = self.multistream_conv_post(up)
        return o, up, spec, phase  # y_mb after upsample (reference :463-467)

    @staticmethod
    def _zero_stuff(y_mb):
        """Zero-stuffing ×s upsample from band-major [B, s, T] to the
        channels-last [B, T*s, s] conv input (the identity updown_filter,
        reference models.py:463)."""
        b, s, t = y_mb.shape
        up = jnp.zeros((b, t, s, s), y_mb.dtype)
        up = up.at[:, :, 0, :].set(y_mb.transpose(0, 2, 1) * s)
        return up.reshape(b, t * s, s)

    def spec_tail(self, spec, phase):
        """(spec, phase) [B, F, s, bins] -> full-band waveform through
        the learned synthesis conv (serving spec-domain join)."""
        y_mb = self.bands_from_spec(spec, phase)
        return self.multistream_conv_post(self._zero_stuff(y_mb))
