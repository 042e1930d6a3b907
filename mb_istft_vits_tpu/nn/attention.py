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


def attention_bias_proximal(length: int) -> jnp.ndarray:
    """[1, 1, t, t] bias favoring nearby positions: -log1p(|i-j|)
    (reference attentions.py:245-254)."""
    r = jnp.arange(length, dtype=jnp.float32)
    diff = r[None, :] - r[:, None]
    return -jnp.log1p(jnp.abs(diff))[None, None]


def subsequent_mask(length: int) -> jnp.ndarray:
    """Lower-triangular causal mask [1, 1, t, t]
    (reference commons.py:95-97)."""
    return jnp.tril(jnp.ones((length, length), jnp.float32))[None, None]


class MultiHeadAttention(nn.Module):
    """Multi-head attention with learned relative positions
    (reference attentions.py:101-254).

    Self-attention when ``context`` is None, cross-attention otherwise
    (the encdec path of reference Decoder, attentions.py:161-169).
    Optional extras mirroring the reference:
      - ``proximal_bias``: add -log1p(|i-j|) to the scores (self-attn only,
        attentions.py:151-153,245-254)
      - ``proximal_init``: conv_k starts as a copy of conv_q
        (attentions.py:141-144)
      - ``block_length``: band-limit attention to ±block_length around the
        diagonal when a mask is given (attentions.py:156-159)
    """

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: Optional[int] = 4
    heads_share: bool = True
    block_length: Optional[int] = None
    proximal_bias: bool = False
    proximal_init: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        context: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = x if context is None else context
        b, t_t, _ = x.shape
        t_s = c.shape[1]
        h, d_k = self.n_heads, self.channels // self.n_heads

        q_init = nn.initializers.xavier_uniform()
        if self.proximal_init and self.is_initializing():
            # conv_k starts equal to conv_q (reference attentions.py:141-144):
            # both ignore their per-param keys and draw from one shared key.
            shared = self.make_rng("params")
            kk, kb = jax.random.split(shared)
            in_ch = x.shape[-1]
            bound = 1.0 / math.sqrt(in_ch)

            def qk_kernel_init(_key, shape, dtype=jnp.float32):
                return q_init(kk, shape, dtype)

            def qk_bias_init(_key, shape, dtype=jnp.float32):
                return jax.random.uniform(kb, shape, dtype, -bound, bound)

            k_init = qk_kernel_init
            q_kernel_init = qk_kernel_init
            bias_init = qk_bias_init
        else:
            k_init = nn.initializers.xavier_uniform()
            q_kernel_init = q_init
            bias_init = None

        q = Conv1d(self.channels, 1, kernel_init=q_kernel_init,
                   bias_init=bias_init, name="conv_q")(x)
        k = Conv1d(self.channels, 1, kernel_init=k_init,
                   bias_init=bias_init, name="conv_k")(c)
        v = Conv1d(self.channels, 1, kernel_init=nn.initializers.xavier_uniform(),
                   name="conv_v")(c)

        # [B, T, C] -> [B, h, T, d_k]
        def split(z):
            return z.reshape(b, z.shape[1], h, d_k).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scale = 1.0 / math.sqrt(d_k)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)

        if self.window_size is not None:
            assert t_s == t_t, "rel-attention is self-attention only"
            t = t_t
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
            # per-head when heads_share=False ([h,m,d]); broadcast when
            # shared ([1,m,d]) — contracting over the table axis with
            # 'nmd' would SUM every head's table into every head's scores
            if key_rel.shape[0] == 1:
                rel_logits = jnp.einsum("bhld,md->bhlm", q * scale,
                                        key_rel[0])
            else:
                rel_logits = jnp.einsum("bhld,hmd->bhlm", q * scale,
                                        key_rel)
            scores = scores + _rel_to_abs(rel_logits)

        if self.proximal_bias:
            assert t_s == t_t, "proximal bias is self-attention only"
            scores = scores + attention_bias_proximal(t_s).astype(scores.dtype)
        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
            if self.block_length is not None:
                assert t_s == t_t, "local attention is self-attention only"
                band = jnp.tril(
                    jnp.triu(jnp.ones((t_t, t_s)), -self.block_length),
                    self.block_length,
                )[None, None]
                scores = jnp.where(band == 0, -1e4, scores)
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.p_dropout, deterministic=not train)(p)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        if self.window_size is not None:
            rel_w = _abs_to_rel(p)
            val_rel = _get_relative_embeddings(emb_rel_v, t, self.window_size)
            if val_rel.shape[0] == 1:
                out = out + jnp.einsum("bhlm,md->bhld", rel_w, val_rel[0])
            else:
                out = out + jnp.einsum("bhlm,hmd->bhld", rel_w, val_rel)
        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
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


class TransformerDecoder(nn.Module):
    """Causal transformer decoder: masked self-attention with proximal
    bias/init + encoder-decoder cross-attention + causal conv-FFN
    (reference attentions.py:50-98 ``Decoder``; unused by the shipped model
    but part of the reference's public surface)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = True
    proximal_init: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray,
                 h: jnp.ndarray, h_mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        t_t = x.shape[1]
        self_attn_mask = subsequent_mask(t_t)  # [1, 1, t, t]
        # [B, 1, T_q, T_kv] cross mask (reference attentions.py:64)
        encdec_attn_mask = (
            x_mask[:, None, :, :1] * h_mask[:, None, :, 0][:, :, None, :]
        )
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, window_size=None,
                proximal_bias=self.proximal_bias,
                proximal_init=self.proximal_init,
                name=f"self_attn_layers_{i}",
            )(x, self_attn_mask, train=train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = LayerNorm(name=f"norm_layers_0_{i}")(x + y)
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, window_size=None,
                name=f"encdec_attn_layers_{i}",
            )(x, encdec_attn_mask, train=train, context=h)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = LayerNorm(name=f"norm_layers_1_{i}")(x + y)
            y = FFN(
                self.hidden_channels, self.filter_channels, self.kernel_size,
                p_dropout=self.p_dropout, causal=True,
                name=f"ffn_layers_{i}",
            )(x, x_mask, train=train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = LayerNorm(name=f"norm_layers_2_{i}")(x + y)
        return x * x_mask


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
