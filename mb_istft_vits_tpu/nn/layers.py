"""Core layers: 1-D convs (optionally weight-normalized, PyTorch-parity
parameterization for checkpoint import), transposed convs, LayerNorm.

Layout: activations [B, T, C]; conv kernels [K, C_in, C_out] (flax WIO).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1  # reference modules.py:17


def leaky_relu(x: jnp.ndarray, slope: float = LRELU_SLOPE) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, slope)


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    """reference commons.py:14-15"""
    return (kernel_size * dilation - dilation) // 2


def normal_init(std: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class Conv1d(nn.Module):
    """torch.nn.Conv1d semantics on [B, T, C] with optional weight norm.

    Weight norm matches torch.nn.utils.weight_norm(conv) with dim=0:
    w = g * v / ||v||_(in,k), g per out-channel. Used throughout the
    reference generator/discriminators (e.g. models.py:257,484).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    padding: Optional[int] = None  # None -> torch default 0
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        in_ch = x.shape[-1]
        kshape = (k, in_ch // self.groups, self.features)
        init = self.kernel_init
        if init is None:
            # match torch Conv1d default: kaiming_uniform(a=sqrt(5)) ~
            # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = in_ch/groups * k
            fan_in = (in_ch // self.groups) * k
            bound = 1.0 / np.sqrt(fan_in)

            def init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

        if self.weight_norm:
            v = self.param("v", init, kshape)
            g = self.param(
                "g", lambda rng: jnp.sqrt(jnp.sum(v * v, axis=(0, 1)))
            )
            w = v * (g / jnp.sqrt(jnp.sum(v * v, axis=(0, 1)) + 1e-12))
        else:
            w = self.param("kernel", init, kshape)

        pad = 0 if self.padding is None else self.padding
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            w.astype(dtype),
            window_strides=(self.stride,),
            padding=((pad, pad),),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            fan_in = (in_ch // self.groups) * k
            bound = 1.0 / np.sqrt(fan_in)
            b_init = self.bias_init or (
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                )
            )
            b = self.param("bias", b_init, (self.features,))
            y = y + b.astype(dtype)
        return y


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d semantics on [B, T, C] with optional weight
    norm (dim=0 of torch's [in, out, k] weight = per-IN-channel g).

    out_len = (T - 1) * stride - 2 * padding + kernel_size
    (reference decoder upsamplers, models.py:261-264).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    kernel_init: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        in_ch = x.shape[-1]
        # kernel stored [K, C_in, C_out]; torch stores [C_in, C_out, K]
        kshape = (k, in_ch, self.features)
        init = self.kernel_init
        if init is None:
            fan_in = self.features * k  # torch convT fan_in counts out*k
            bound = 1.0 / np.sqrt(fan_in)

            def init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

        if self.weight_norm:
            v = self.param("v", init, kshape)
            # per-in-channel norm over (k, out): torch weight_norm dim=0 on [in,out,k]
            g = self.param(
                "g", lambda rng: jnp.sqrt(jnp.sum(v * v, axis=(0, 2)))
            )
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2)) + 1e-12)
            w = v * (g / norm)[None, :, None]
        else:
            w = self.param("kernel", init, kshape)

        dtype = self.dtype or x.dtype
        # conv_transpose(x, w) == conv(zero-dilated x, width-flipped w)
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            jnp.flip(w, axis=0).astype(dtype),
            window_strides=(1,),
            padding=((pad, pad),),
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            fan_in = self.features * k
            bound = 1.0 / np.sqrt(fan_in)
            b = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (self.features,),
            )
            y = y + b.astype(dtype)
        return y


class Conv2dP(nn.Module):
    """torch.nn.Conv2d semantics on [B, H, W, C] with optional weight norm
    (for the period discriminators, reference models.py:477-511)."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    weight_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kshape = (kh, kw, in_ch, self.features)
        fan_in = in_ch * kh * kw
        bound = 1.0 / np.sqrt(fan_in)

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        if self.weight_norm:
            v = self.param("v", init, kshape)
            g = self.param(
                "g", lambda rng: jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2)))
            )
            w = v * (g / jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2)) + 1e-12))
        else:
            w = self.param("kernel", init, kshape)

        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            w.astype(dtype),
            window_strides=self.stride,
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (self.features,),
            )
            y = y + b.astype(dtype)
        return y


class LayerNorm(nn.Module):
    """Channel LayerNorm, eps matching reference modules.py:20-32. Operates
    on the last axis directly (no transposes needed in [B, T, C] layout)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * gamma + beta).astype(x.dtype)


