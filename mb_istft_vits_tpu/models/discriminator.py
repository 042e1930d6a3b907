"""Multi-period + scale discriminator.

Behavior contract: reference `models.py:477-564`. Input waveforms [B, T, 1].
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mb_istft_vits_tpu.nn.layers import Conv1d, Conv2dP, get_padding, leaky_relu


class DiscriminatorP(nn.Module):
    """Period discriminator: fold time into [T/p, p] and run 2-D convs
    (reference models.py:477-511)."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        fmap = []
        b, t, c = x.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // p, p, c)  # NHWC

        chans = [32, 128, 512, 1024]
        pad = (get_padding(self.kernel_size, 1), 0)
        for i, ch in enumerate(chans):
            x = Conv2dP(ch, (self.kernel_size, 1), (self.stride, 1), pad,
                        weight_norm=True, name=f"convs_{i}")(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv2dP(1024, (self.kernel_size, 1), (1, 1), pad,
                    weight_norm=True, name="convs_4")(x)
        x = leaky_relu(x)
        fmap.append(x)
        x = Conv2dP(1, (3, 1), (1, 1), (1, 0), weight_norm=True,
                    name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped 1-D convs (reference models.py:514-539)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        fmap = []
        b = x.shape[0]
        specs = [
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (ch, k, s, g, pad) in enumerate(specs):
            x = Conv1d(ch, k, stride=s, groups=g, padding=pad,
                       weight_norm=True, name=f"convs_{i}")(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv1d(1, 3, padding=1, weight_norm=True, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """S + P{2,3,5,7,11} ensemble (reference models.py:542-564)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        discs = [DiscriminatorS(name="disc_s")] + [
            DiscriminatorP(p, name=f"disc_p{p}") for p in self.periods
        ]
        for d in discs:
            out_r, fm_r = d(y)
            out_g, fm_g = d(y_hat)
            y_d_rs.append(out_r)
            y_d_gs.append(out_g)
            fmap_rs.append(fm_r)
            fmap_gs.append(fm_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
