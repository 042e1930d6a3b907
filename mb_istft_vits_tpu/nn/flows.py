"""Normalizing-flow layers: Log, Flip, ElementwiseAffine, affine residual
coupling, spline ConvFlow.

Behavior contract: reference `modules.py:269-400`. Channel-last [B, T, C];
Flip reverses the channel axis (reference flips dim 1 of [B, C, T]).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.nn.blocks import DDSConv, WN
from mb_istft_vits_tpu.nn.layers import Conv1d
from mb_istft_vits_tpu.nn.transforms import piecewise_rational_quadratic_transform


def flip_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Flip flow (reference modules.py:280-287); logdet = 0."""
    return x[..., ::-1]


class Log(nn.Module):
    """y = log(clamp(x)) forward / exp reverse (reference modules.py:269-277)."""

    def __call__(self, x, x_mask, reverse: bool = False):
        if not reverse:
            y = jnp.log(jnp.maximum(x, 1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask


class ElementwiseAffine(nn.Module):
    """Per-channel affine flow (reference modules.py:290-305)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class ResidualCouplingLayer(nn.Module):
    """Affine coupling with WN body, mean-only variant
    (reference modules.py:308-353)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        reverse: bool = False,
        train: bool = False,
    ):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * x_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            p_dropout=self.p_dropout,
            name="enc",
        )(h, x_mask, g=g, train=train)
        # post conv weight AND bias zero-init: the coupling is the
        # identity at init (reference modules.py:331-332)
        stats = Conv1d(
            half * (2 - int(self.mean_only)),
            1,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="post",
        )(h) * x_mask
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m, logs = stats, jnp.zeros_like(stats)

        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ConvFlow(nn.Module):
    """Spline coupling flow over [u, v] pairs used by the stochastic
    duration predictor (reference modules.py:356-400)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        reverse: bool = False,
        train: bool = False,
    ):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.filter_channels, 1, name="pre")(x0)
        h = DDSConv(
            self.filter_channels, self.kernel_size, self.n_layers,
            p_dropout=0.0, name="convs",
        )(h, x_mask, g=g, train=train)
        # weight AND bias zero-init -> identity spline at init
        # (reference modules.py:370-371)
        h = Conv1d(
            half * (self.num_bins * 3 - 1),
            1,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(h) * x_mask

        b, t, _ = x0.shape
        # [B, T, half*(3k-1)] -> [B, T, half, 3k-1]
        h = h.reshape(b, t, half, -1)
        denom = jnp.sqrt(jnp.asarray(self.filter_channels, h.dtype))
        uw = h[..., : self.num_bins] / denom
        uh = h[..., self.num_bins : 2 * self.num_bins] / denom
        ud = h[..., 2 * self.num_bins :]

        x1, logabsdet = piecewise_rational_quadratic_transform(
            x1, uw, uh, ud, inverse=reverse, tails="linear",
            tail_bound=self.tail_bound,
        )
        x = jnp.concatenate([x0, x1], axis=-1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not reverse:
            return x, logdet
        return x
