"""GAN / KL / duration / multi-resolution STFT losses.

Behavior contract: reference `losses.py` and `stft_loss.py`. All losses are
computed in float32 regardless of compute dtype (matching the fp32 autocast
islands at reference train_latest.py:190,205).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.dsp.stft import stft_magnitude


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """×2-weighted L1 feature matching (reference losses.py:9-17)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            gl = gl.astype(jnp.float32)
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(
    disc_real_outputs, disc_generated_outputs
) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """LSGAN discriminator loss (reference losses.py:20-33)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        r_loss = jnp.mean((1 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """LSGAN generator loss (reference losses.py:36-45)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1 - dg.astype(jnp.float32)) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask) -> jnp.ndarray:
    """Masked gaussian KL prior↔posterior (reference losses.py:48-63).
    All inputs [B, T, C]; z_mask [B, T, 1]."""
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    return kl / jnp.sum(z_mask)


def stft_loss_pair(
    x: jnp.ndarray, y: jnp.ndarray, fft_size: int, hop: int, win: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(spectral convergence, log-mag L1) at one resolution
    (reference stft_loss.py:31-94). x, y: [B, T]."""
    x_mag = stft_magnitude(x.astype(jnp.float32), fft_size, hop, win,
                           center=True, eps=1e-7)
    y_mag = stft_magnitude(y.astype(jnp.float32), fft_size, hop, win,
                           center=True, eps=1e-7)
    sc = jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)
    mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
    return sc, mag


def multi_resolution_stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Sequence[int] = (120, 240, 50),
    win_lengths: Sequence[int] = (600, 1200, 240),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Averaged MR-STFT loss (reference stft_loss.py:97-135)."""
    sc_loss, mag_loss = 0.0, 0.0
    for fs, hs, wl in zip(fft_sizes, hop_sizes, win_lengths):
        sc, mag = stft_loss_pair(x, y, fs, hs, wl)
        sc_loss += sc
        mag_loss += mag
    n = len(fft_sizes)
    return sc_loss / n, mag_loss / n


def subband_stft_loss(
    y_mb: jnp.ndarray,
    y_hat_mb: jnp.ndarray,
    fft_sizes: Sequence[int],
    hop_sizes: Sequence[int],
    win_lengths: Sequence[int],
) -> jnp.ndarray:
    """MR-STFT on flattened sub-band signals (reference losses.py:65-70).
    y_mb, y_hat_mb: BAND-MAJOR [B, subbands, T_sub] — the reference's own
    [B, S, T] layout, so the flatten is a free reshape (no 4-lane
    transpose in the loss path)."""
    def flat(z):
        b, s, t = z.shape
        return z.reshape(b * s, t)

    y = flat(y_mb)
    y_hat = flat(y_hat_mb)
    t = min(y.shape[-1], y_hat.shape[-1])
    sc, mag = multi_resolution_stft_loss(
        y_hat[:, :t], y[:, :t], fft_sizes, hop_sizes, win_lengths
    )
    return sc + mag
