"""Composite conv blocks: DDSConv, gated WaveNet (WN), HiFi-GAN ResBlocks.

Behavior contract: reference `modules.py:70-266`. All on [B, T, C] with
masks [B, T, 1].
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.nn.layers import (
    Conv1d,
    LayerNorm,
    get_padding,
    leaky_relu,
)


class ConvReluNorm(nn.Module):
    """Conv→LayerNorm→ReLU→dropout stack with a zero-initialized residual
    projection (reference modules.py:35-67; unused by the shipped model but
    part of the reference's public surface)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        assert self.n_layers > 1
        x_org = x
        pad = self.kernel_size // 2
        for i in range(self.n_layers):
            x = Conv1d(self.hidden_channels, self.kernel_size, padding=pad,
                       name=f"conv_layers_{i}")(x * x_mask)
            x = LayerNorm(name=f"norm_layers_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        # proj starts at zero so the block is the identity at init
        # (reference modules.py:54-56)
        x = Conv1d(self.out_channels, 1,
                   kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros,
                   name="proj")(x)
        return (x_org + x) * x_mask


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack (reference modules.py:70-108)."""

    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size**i
            pad = (self.kernel_size * dilation - dilation) // 2
            y = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=dilation,
                groups=self.channels,
                padding=pad,
                name=f"convs_sep_{i}",
            )(x * x_mask)
            y = LayerNorm(name=f"norms_1_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = Conv1d(self.channels, 1, name=f"convs_1x1_{i}")(y)
            y = LayerNorm(name=f"norms_2_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = x + y
        return x * x_mask


class WN(nn.Module):
    """Non-causal WaveNet with fused gated tanh*sigmoid and global
    conditioning (reference modules.py:111-176). All convs weight-normed."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None:
            # g: [B, 1, gin] -> all layers' conditioning at once
            g_all = Conv1d(2 * h * self.n_layers, 1, weight_norm=True,
                           name="cond_layer")(g)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            pad = (self.kernel_size * dilation - dilation) // 2
            x_in = Conv1d(
                2 * h,
                self.kernel_size,
                dilation=dilation,
                padding=pad,
                weight_norm=True,
                name=f"in_layers_{i}",
            )(x)
            if g is not None:
                x_in = x_in + g_all[:, :, i * 2 * h : (i + 1) * 2 * h]
            # fused gated activation (reference commons.py:100-107);
            # XLA fuses the add/tanh/sigmoid/mul into one VPU kernel
            t_act = jnp.tanh(x_in[..., :h])
            s_act = jax.nn.sigmoid(x_in[..., h:])
            acts = t_act * s_act
            acts = nn.Dropout(self.p_dropout, deterministic=not train)(acts)
            res_skip_ch = 2 * h if i < self.n_layers - 1 else h
            res_skip = Conv1d(res_skip_ch, 1, weight_norm=True,
                              name=f"res_skip_layers_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask


class ResBlock1(nn.Module):
    """HiFi-GAN ResBlock type 1 (reference modules.py:187-228)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: Optional[jnp.ndarray] = None,
        g: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.gin_channels != 0 and g is not None:
            x = x + Conv1d(self.channels, 1, name="cond")(g)
        for j, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                padding=get_padding(self.kernel_size, d),
                weight_norm=True,
                name=f"convs1_{j}",
            )(xt)
            xt = leaky_relu(xt)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                padding=get_padding(self.kernel_size, 1),
                weight_norm=True,
                name=f"convs2_{j}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    """HiFi-GAN ResBlock type 2 (reference modules.py:237-262)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: Optional[jnp.ndarray] = None,
        g: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.gin_channels != 0 and g is not None:
            x = x + Conv1d(self.channels, 1, name="cond")(g)
        for j, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                padding=get_padding(self.kernel_size, d),
                weight_norm=True,
                name=f"convs_{j}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x
