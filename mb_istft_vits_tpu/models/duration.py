"""Duration predictors: deterministic conv stack and stochastic flow-based.

Behavior contract: reference `models.py:22-137`. Both stop gradients into
the text-encoder hidden states (reference models.py:56,124).
"""

from __future__ import annotations

import math
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.nn import Conv1d, DDSConv, LayerNorm
from mb_istft_vits_tpu.nn.flows import ConvFlow, ElementwiseAffine, Log, flip_channels


class DurationPredictor(nn.Module):
    """conv-relu-LN-dropout ×2 -> 1ch log-duration
    (reference models.py:103-137). Default for all shipped configs
    (use_sdp: false)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        x = jax.lax.stop_gradient(x)
        if g is not None:
            x = x + Conv1d(self.in_channels, 1, name="cond")(g)
        x = Conv1d(self.filter_channels, self.kernel_size,
                   padding=self.kernel_size // 2, name="conv_1")(x * x_mask)
        x = jax.nn.relu(x)
        x = LayerNorm(name="norm_1")(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = Conv1d(self.filter_channels, self.kernel_size,
                   padding=self.kernel_size // 2, name="conv_2")(x * x_mask)
        x = jax.nn.relu(x)
        x = LayerNorm(name="norm_2")(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = Conv1d(1, 1, name="proj")(x * x_mask)
        return x * x_mask


class StochasticDurationPredictor(nn.Module):
    """Flow-based NLL of log-durations (reference models.py:22-100).

    forward (reverse=False) returns per-sample NLL + logq [B];
    reverse samples logw [B, T, 1] from noise.
    Note: filter_channels is overridden to in_channels
    (reference models.py:25).
    """

    in_channels: int
    filter_channels: int  # kept for signature parity; overridden below
    kernel_size: int
    p_dropout: float
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        fc = self.in_channels  # reference models.py:25 override
        self.log_flow = Log()
        flows: List[nn.Module] = [ElementwiseAffine(2)]
        for i in range(self.n_flows):
            flows.append(
                ConvFlow(2, fc, self.kernel_size, n_layers=3,
                         name=f"flows_cf_{i}")
            )
        self.flows = flows

        self.post_pre = Conv1d(fc, 1, name="post_pre")
        self.post_proj = Conv1d(fc, 1, name="post_proj")
        self.post_convs = DDSConv(fc, self.kernel_size, n_layers=3,
                                  p_dropout=self.p_dropout, name="post_convs")
        post_flows: List[nn.Module] = [ElementwiseAffine(2)]
        for i in range(4):
            post_flows.append(
                ConvFlow(2, fc, self.kernel_size, n_layers=3,
                         name=f"post_flows_cf_{i}")
            )
        self.post_flows = post_flows

        self.pre = Conv1d(fc, 1, name="pre")
        self.proj = Conv1d(fc, 1, name="proj")
        self.convs = DDSConv(fc, self.kernel_size, n_layers=3,
                             p_dropout=self.p_dropout, name="convs")
        if self.gin_channels != 0:
            self.cond = Conv1d(fc, 1, name="cond")

    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        w: Optional[jnp.ndarray] = None,
        g: Optional[jnp.ndarray] = None,
        reverse: bool = False,
        noise_scale: float = 1.0,
        noise_rng: Optional[jax.Array] = None,
        train: bool = False,
    ):
        if not reverse:
            return self.nll(x, x_mask, w, g=g, noise_rng=noise_rng,
                            train=train)
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None:
            x = x + self.cond(g)
        x = self.convs(x, x_mask, train=train)
        x = self.proj(x) * x_mask

        b, t, _ = x.shape
        z = jax.random.normal(noise_rng, (b, t, 2), x.dtype) * noise_scale
        # Reversed main-flow chain with the first ConvFlow dropped
        # ("remove a useless vflow", reference models.py:93-94):
        #   Flip, CF_{n-1}, Flip, ..., CF_1, Flip, EA  (all in reverse mode)
        for i in range(self.n_flows - 1, 0, -1):
            z = flip_channels(z)
            z = self.flows[1 + i](z, x_mask, g=x, reverse=True, train=train)
        z = flip_channels(z)
        z = self.flows[0](z, x_mask, reverse=True)
        logw = z[..., 0:1]
        return logw

    def nll(self, x, x_mask, w, g=None, noise_rng=None, train=False):
        """Training NLL (reference models.py:64-91)."""
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None:
            x = x + self.cond(g)
        x = self.convs(x, x_mask, train=train)
        x = self.proj(x) * x_mask

        b, t, _ = x.shape
        logdet_tot_q = 0.0
        h_w = self.post_pre(w)
        h_w = self.post_convs(h_w, x_mask, train=train)
        h_w = self.post_proj(h_w) * x_mask
        e_q = jax.random.normal(noise_rng, (b, t, 2), x.dtype) * x_mask
        z_q = e_q
        # post flows: EA, then 4×(ConvFlow, Flip) (reference :43-47,74-76)
        z_q, ld = self.post_flows[0](z_q, x_mask)
        logdet_tot_q += ld
        for i in range(4):
            z_q, ld = self.post_flows[1 + i](z_q, x_mask, g=(x + h_w),
                                             train=train)
            logdet_tot_q += ld
            z_q = flip_channels(z_q)
        z_u, z1 = z_q[..., 0:1], z_q[..., 1:2]
        u = jax.nn.sigmoid(z_u) * x_mask
        z0 = (w - u) * x_mask
        logdet_tot_q += jnp.sum(
            (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask,
            axis=(1, 2),
        )
        logq = (
            jnp.sum(-0.5 * (math.log(2 * math.pi) + e_q**2) * x_mask,
                    axis=(1, 2))
            - logdet_tot_q
        )

        logdet_tot = 0.0
        z0, logdet = self.log_flow(z0, x_mask)
        logdet_tot += logdet
        z = jnp.concatenate([z0, z1], axis=-1)
        # main flows: EA, then 4×(ConvFlow, Flip) (reference :33-38,87-89)
        z, ld = self.flows[0](z, x_mask)
        logdet_tot += ld
        for i in range(self.n_flows):
            z, ld = self.flows[1 + i](z, x_mask, g=x, train=train)
            logdet_tot += ld
            z = flip_channels(z)
        nll = (
            jnp.sum(0.5 * (math.log(2 * math.pi) + z**2) * x_mask,
                    axis=(1, 2))
            - logdet_tot
        )
        return nll + logq
