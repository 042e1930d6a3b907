"""Relative-position multi-head attention encoder.

Behavior contract: reference `attentions.py:13-47,101-254,257-303` —
1x1-conv QKV, learned relative-position embeddings (window ±4, heads
shared), rel→abs index shuffles, conv-FFN with same padding. Text sequences
are short (≤~400 tokens with blanks), so plain dense attention on the MXU is
the right TPU design — no flash/blockwise machinery needed.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.nn.layers import Conv1d, LayerNorm


def _rel_to_abs(x: jnp.ndarray) -> jnp.ndarray:
    """[b, h, l, 2l-1] -> [b, h, l, l] (reference attentions.py:214-229)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1 :]


def _abs_to_rel(x: jnp.ndarray) -> jnp.ndarray:
    """[b, h, l, l] -> [b, h, l, 2l-1] (reference attentions.py:231-243)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l * l + l * (l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    x = x.reshape(b, h, l, 2 * l)
    return x[:, :, :, 1:]


def _get_relative_embeddings(emb: jnp.ndarray, length: int,
                             window_size: int) -> jnp.ndarray:
    """Slice/pad the ±window rel-pos table to 2*length-1 entries
    (reference attentions.py:199-212). emb: [heads_rel, 2w+1, d_k]."""
    pad_len = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad_len > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_len, pad_len), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class MultiHeadAttention(nn.Module):
    """Self-attention with learned relative positions
    (reference attentions.py:101-254)."""

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: Optional[int] = 4
    heads_share: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        b, t, _ = x.shape
        h, d_k = self.n_heads, self.channels // self.n_heads
        q = Conv1d(self.channels, 1, kernel_init=nn.initializers.xavier_uniform(),
                   name="conv_q")(x)
        k = Conv1d(self.channels, 1, kernel_init=nn.initializers.xavier_uniform(),
                   name="conv_k")(x)
        v = Conv1d(self.channels, 1, kernel_init=nn.initializers.xavier_uniform(),
                   name="conv_v")(x)

        # [B, T, C] -> [B, h, T, d_k]
        def split(z):
            return z.reshape(b, t, h, d_k).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scale = 1.0 / math.sqrt(d_k)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)

        if self.window_size is not None:
            n_heads_rel = 1 if self.heads_share else h
            rel_std = d_k**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                lambda key, shape: rel_std * jax.random.normal(key, shape),
                (n_heads_rel, 2 * self.window_size + 1, d_k),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                lambda key, shape: rel_std * jax.random.normal(key, shape),
                (n_heads_rel, 2 * self.window_size + 1, d_k),
            )
            key_rel = _get_relative_embeddings(emb_rel_k, t, self.window_size)
            # [b,h,l,d] x [1,m,d] -> [b,h,l,m]
            rel_logits = jnp.einsum("bhld,nmd->bhlm", q * scale, key_rel)
            scores = scores + _rel_to_abs(rel_logits)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.p_dropout, deterministic=not train)(p)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        if self.window_size is not None:
            rel_w = _abs_to_rel(p)
            val_rel = _get_relative_embeddings(emb_rel_v, t, self.window_size)
            out = out + jnp.einsum("bhlm,nmd->bhld", rel_w, val_rel)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.channels)
        return Conv1d(self.out_channels, 1, name="conv_o")(out)


class FFN(nn.Module):
    """Conv feed-forward with same/causal padding
    (reference attentions.py:257-303)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    causal: bool = False

    def _pad(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kernel_size == 1:
            return x
        if self.causal:
            lo, hi = self.kernel_size - 1, 0
        else:
            lo, hi = (self.kernel_size - 1) // 2, self.kernel_size // 2
        return jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        y = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(
            self._pad(x * x_mask)
        )
        y = jax.nn.relu(y)
        y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
        y = Conv1d(self.out_channels, self.kernel_size, name="conv_2")(
            self._pad(y * x_mask)
        )
        return y * x_mask


class TransformerEncoder(nn.Module):
    """Pre-conv1x1 rel-pos transformer encoder
    (reference attentions.py:13-47)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        attn_mask = x_mask[:, None, :, 0][:, :, None, :] * x_mask[:, None, :, :1]
        # -> [B, 1, T_q, T_k]
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                p_dropout=self.p_dropout,
                window_size=self.window_size,
                name=f"attn_layers_{i}",
            )(x, attn_mask, train=train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = LayerNorm(name=f"norm_layers_1_{i}")(x + y)
            y = FFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                p_dropout=self.p_dropout,
                name=f"ffn_layers_{i}",
            )(x, x_mask, train=train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = LayerNorm(name=f"norm_layers_2_{i}")(x + y)
        return x * x_mask
