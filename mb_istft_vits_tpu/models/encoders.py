"""Text encoder and posterior encoder.

Behavior contract: reference `models.py:140-181` (TextEncoder) and
`models.py:217-246` (PosteriorEncoder).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.nn import WN, Conv1d, TransformerEncoder
from mb_istft_vits_tpu.ops import sequence_mask


class TextEncoder(nn.Module):
    """Embedding·√h -> rel-pos transformer -> (m, logs) prior projection
    (reference models.py:140-181)."""

    n_vocab: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_lengths: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        emb = nn.Embed(
            self.n_vocab,
            self.hidden_channels,
            embedding_init=nn.initializers.normal(
                self.hidden_channels**-0.5
            ),
            name="emb",
        )
        h = emb(x) * math.sqrt(self.hidden_channels)  # [B, T, H]
        x_mask = sequence_mask(x_lengths, x.shape[1])[..., None].astype(h.dtype)
        h = TransformerEncoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            name="encoder",
        )(h * x_mask, x_mask, train=train)
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(h) * x_mask
        m, logs = (
            stats[..., : self.out_channels],
            stats[..., self.out_channels :],
        )
        return h, m, logs, x_mask


class PosteriorEncoder(nn.Module):
    """Linear-spec -> WN(16) -> reparameterized gaussian posterior
    (reference models.py:217-246)."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self,
        y: jnp.ndarray,
        y_lengths: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        noise_rng: Optional[jax.Array] = None,
        train: bool = False,
    ):
        y_mask = sequence_mask(y_lengths, y.shape[1])[..., None].astype(y.dtype)
        h = Conv1d(self.hidden_channels, 1, name="pre")(y) * y_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, y_mask, g=g, train=train)
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(h) * y_mask
        m = stats[..., : self.out_channels]
        logs = stats[..., self.out_channels :]
        if noise_rng is None:
            # the reference samples unconditionally (models.py:245); a
            # silent deterministic fallback (z = m) would collapse the
            # posterior and quietly degrade training — fail instead
            raise ValueError(
                "PosteriorEncoder requires noise_rng (pass rngs={'noise': "
                "...} through Synthesizer.apply)")
        eps = jax.random.normal(noise_rng, m.shape, m.dtype)
        z = (m + eps * jnp.exp(logs)) * y_mask
        return z, m, logs, y_mask
