"""Top-level VITS synthesizer: training forward, inference, latent-only
inference, decoder-only decode, voice conversion.

Behavior contract: reference `models.py:568-798` (SynthesizerTrn).

TPU-first notes:
  - all methods are jittable with static shapes; inference uses a static
    `max_frames` bound instead of the reference's data-dependent output
    length (models.py:719-722)
  - monotonic alignment runs on-device (ops.mas)
  - PRNGs are explicit flax rng collections: 'noise' (posterior/prior/SDP
    sampling), 'dropout', 'slice' (random training segment)
  - `decode` is a first-class decoder-only entry point, the building block
    for chunked/streaming synthesis (the reference's
    synthesize_from_shared_latents is broken as shipped,
    synthesis_module.py:335,350)
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.config import ModelConfig
from mb_istft_vits_tpu.models.decoders import (
    ISTFTGenerator,
    MultibandISTFTGenerator,
    MultistreamISTFTGenerator,
)
from mb_istft_vits_tpu.models.duration import (
    DurationPredictor,
    StochasticDurationPredictor,
)
from mb_istft_vits_tpu.models.encoders import PosteriorEncoder, TextEncoder
from mb_istft_vits_tpu.nn.flows import ResidualCouplingLayer, flip_channels
from mb_istft_vits_tpu.ops import (
    generate_path,
    maximum_path,
    rand_slice_segments,
    sequence_mask,
)


class ResidualCouplingBlock(nn.Module):
    """4×(affine coupling + Flip), invertible (reference models.py:184-214)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        self.couplings = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers,
                gin_channels=self.gin_channels, mean_only=True,
                name=f"coupling_{i}",
            )
            for i in range(self.n_flows)
        ]

    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 train: bool = False):
        if not reverse:
            for c in self.couplings:
                x, _ = c(x, x_mask, g=g, train=train)
                x = flip_channels(x)
        else:
            for c in reversed(self.couplings):
                x = flip_channels(x)
                x = c(x, x_mask, g=g, reverse=True, train=train)
        return x


class InferOutput(NamedTuple):
    o: jnp.ndarray          # [B, T_wav, 1]
    o_mb: Optional[jnp.ndarray]
    spec: jnp.ndarray
    phase: jnp.ndarray
    attn: jnp.ndarray       # [B, max_frames, T_x]
    y_mask: jnp.ndarray     # [B, max_frames, 1]
    y_lengths: jnp.ndarray  # [B] frames
    latents: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


class Synthesizer(nn.Module):
    """SynthesizerTrn equivalent (reference models.py:568-798)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.enc_p = TextEncoder(
            cfg.n_vocab, cfg.inter_channels, cfg.hidden_channels,
            cfg.filter_channels, cfg.n_heads, cfg.n_layers, cfg.kernel_size,
            cfg.p_dropout, name="enc_p",
        )
        dec_args = dict(
            initial_channel=cfg.inter_channels,
            resblock=cfg.resblock,
            resblock_kernel_sizes=tuple(cfg.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in cfg.resblock_dilation_sizes
            ),
            upsample_rates=tuple(cfg.upsample_rates),
            upsample_initial_channel=cfg.upsample_initial_channel,
            upsample_kernel_sizes=tuple(cfg.upsample_kernel_sizes),
            gen_istft_n_fft=cfg.gen_istft_n_fft,
            gen_istft_hop_size=cfg.gen_istft_hop_size,
            gin_channels=cfg.gin_channels,
        )
        kind = cfg.decoder_kind
        if kind == "mb_istft":
            self.dec = MultibandISTFTGenerator(
                subbands=cfg.subbands, name="dec", **dec_args
            )
        elif kind == "ms_istft":
            self.dec = MultistreamISTFTGenerator(
                subbands=cfg.subbands, name="dec", **dec_args
            )
        else:
            self.dec = ISTFTGenerator(name="dec", **dec_args)

        self.enc_q = PosteriorEncoder(
            cfg.spec_channels, cfg.inter_channels, cfg.hidden_channels,
            5, 1, 16, gin_channels=cfg.gin_channels, name="enc_q",
        )
        self.flow = ResidualCouplingBlock(
            cfg.inter_channels, cfg.hidden_channels, 5, 1, 4,
            gin_channels=cfg.gin_channels, name="flow",
        )
        if cfg.use_sdp:
            self.dp = StochasticDurationPredictor(
                cfg.hidden_channels, 192, 3, 0.5, 4,
                gin_channels=cfg.gin_channels, name="dp",
            )
        else:
            self.dp = DurationPredictor(
                cfg.hidden_channels, 256, 3, 0.5,
                gin_channels=cfg.gin_channels, name="dp",
            )
        if cfg.n_speakers > 1:
            self.emb_g = nn.Embed(cfg.n_speakers, cfg.gin_channels,
                                  name="emb_g")

    def _speaker(self, sid: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
        # emb_g exists only for n_speakers > 1 (setup above); the reference
        # gates usage on n_speakers > 0 (models.py:661) and crashes for
        # n_speakers == 1 with a sid — here 0 and 1 are both single-speaker
        if self.cfg.n_speakers > 1 and sid is not None:
            return self.emb_g(sid)[:, None, :]  # [B, 1, gin]
        return None

    # ------------------------------------------------------------------
    # training forward (reference models.py:657-695)
    # ------------------------------------------------------------------
    def __call__(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        y: jnp.ndarray,
        y_lengths: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
        train: bool = True,
    ):
        cfg = self.cfg
        hx, m_p, logs_p, x_mask = self.enc_p(x, x_lengths, train=train)
        g = self._speaker(sid)

        z, m_q, logs_q, y_mask = self.enc_q(
            y, y_lengths, g=g,
            noise_rng=self.make_rng("noise"), train=train,
        )
        z_p = self.flow(z, y_mask, g=g, train=train)

        # --- hard alignment via on-device MAS (reference models.py:668-678)
        zp32 = jax.lax.stop_gradient(z_p).astype(jnp.float32)
        mp32 = jax.lax.stop_gradient(m_p).astype(jnp.float32)
        lp32 = jax.lax.stop_gradient(logs_p).astype(jnp.float32)
        s_p_sq_r = jnp.exp(-2.0 * lp32)  # [B, T_x, C]
        neg_cent1 = jnp.sum(
            -0.5 * math.log(2 * math.pi) - lp32, axis=-1
        )[:, None, :]  # [B, 1, T_x]
        neg_cent2 = jnp.einsum("byc,bxc->byx", -0.5 * zp32**2, s_p_sq_r)
        neg_cent3 = jnp.einsum("byc,bxc->byx", zp32, mp32 * s_p_sq_r)
        neg_cent4 = jnp.sum(-0.5 * mp32**2 * s_p_sq_r, axis=-1)[:, None, :]
        neg_cent = neg_cent1 + neg_cent2 + neg_cent3 + neg_cent4

        attn_mask = y_mask[:, :, :1] * jnp.swapaxes(x_mask, 1, 2)  # [B,Ty,Tx]
        attn32 = jax.lax.stop_gradient(
            maximum_path(neg_cent, attn_mask.astype(jnp.float32))
        )
        attn = attn32.astype(z_p.dtype)

        # duration target/loss in fp32 regardless of compute dtype (the
        # reference keeps losses out of autocast, train_latest.py:190,205)
        w = jnp.sum(attn32, axis=1, keepdims=False)[..., None]  # [B, T_x, 1]
        x_mask32 = x_mask.astype(jnp.float32)
        if cfg.use_sdp:
            l_length = self.dp(
                hx, x_mask, w=w.astype(hx.dtype), g=g,
                noise_rng=self.make_rng("noise"), train=train,
            ).astype(jnp.float32)
            l_length = l_length / jnp.sum(x_mask32)
        else:
            logw_ = jnp.log(w + 1e-6) * x_mask32
            logw = self.dp(hx, x_mask, g=g, train=train).astype(jnp.float32)
            l_length = jnp.sum((logw - logw_) ** 2, axis=(1, 2)) / jnp.sum(
                x_mask32
            )

        # expand prior (reference models.py:690-691)
        m_p = jnp.einsum("byx,bxc->byc", attn, m_p)
        logs_p = jnp.einsum("byx,bxc->byc", attn, logs_p)

        z_slice, ids_slice = rand_slice_segments(
            z, self.make_rng("slice"), y_lengths, cfg.segment_size
        )
        o, o_mb, _, _ = self.dec(z_slice, g=g)
        return (
            o, o_mb, l_length, attn, ids_slice, x_mask, y_mask,
            (z, z_p, m_p, logs_p, m_q, logs_q),
        )

    # ------------------------------------------------------------------
    # trimmed training forward for the discriminator step: only the
    # subgraph that produces the fake slice (posterior -> random slice ->
    # decoder). The text encoder, MAS, flow and duration predictor feed
    # only generator losses, so the D step (train_latest.py:189) never
    # needs them. RNG discipline: the first "noise" and first "slice"
    # make_rng calls happen at the same module path and call index as in
    # __call__, so z and ids_slice are bit-identical to the full forward
    # under the same rng dict (asserted in tests/test_train.py).
    # ------------------------------------------------------------------
    def fake_slice(
        self,
        y: jnp.ndarray,
        y_lengths: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
        train: bool = True,
    ):
        g = self._speaker(sid)
        z, _m_q, _logs_q, _y_mask = self.enc_q(
            y, y_lengths, g=g,
            noise_rng=self.make_rng("noise"), train=train,
        )
        z_slice, ids_slice = rand_slice_segments(
            z, self.make_rng("slice"), y_lengths, self.cfg.segment_size
        )
        o, o_mb, _, _ = self.dec(z_slice, g=g)
        return o, ids_slice

    # ------------------------------------------------------------------
    # inference (reference models.py:697-737)
    # ------------------------------------------------------------------
    def _duration_head(self, x, x_lengths, sid, length_scale,
                       noise_scale_w):
        """Text encoder + duration predictor + ceil — the ONE definition
        of predicted durations. The serving frame-bucket probe
        (predict_frames) and the real decode (_infer_latents) must agree
        EXACTLY (same rng stream, same arithmetic) or the probe picks
        buckets the decode then over/under-fills."""
        hx, m_p, logs_p, x_mask = self.enc_p(x, x_lengths, train=False)
        g = self._speaker(sid)
        if self.cfg.use_sdp:
            logw = self.dp(hx, x_mask, g=g, reverse=True,
                           noise_scale=noise_scale_w,
                           noise_rng=self.make_rng("noise"))
        else:
            logw = self.dp(hx, x_mask, g=g)
        w_ceil = jnp.ceil(jnp.exp(logw) * x_mask * length_scale)
        y_lengths = jnp.maximum(
            jnp.sum(w_ceil, axis=(1, 2)), 1.0
        ).astype(jnp.int32)
        return hx, m_p, logs_p, x_mask, g, w_ceil, y_lengths

    def _infer_latents(self, x, x_lengths, sid, noise_scale, length_scale,
                       noise_scale_w, max_frames):
        (hx, m_p, logs_p, x_mask, g, w_ceil,
         y_lengths) = self._duration_head(x, x_lengths, sid, length_scale,
                                          noise_scale_w)
        y_lengths = jnp.minimum(y_lengths, max_frames)
        y_mask = sequence_mask(y_lengths, max_frames)[..., None].astype(
            x_mask.dtype
        )
        attn_mask = y_mask[:, :, :1] * jnp.swapaxes(x_mask, 1, 2)
        attn = generate_path(w_ceil[..., 0], attn_mask)  # [B, Ty, Tx]

        m_p = jnp.einsum("byx,bxc->byc", attn, m_p)
        logs_p = jnp.einsum("byx,bxc->byc", attn, logs_p)

        eps = jax.random.normal(self.make_rng("noise"), m_p.shape, m_p.dtype)
        z_p = m_p + eps * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, y_mask, g=g, reverse=True)
        return z, z_p, m_p, logs_p, attn, y_mask, y_lengths, g

    def predict_frames(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
        length_scale: float = 1.0,
        noise_scale_w: float = 1.0,
    ) -> jnp.ndarray:
        """Cheap duration probe: total predicted frames per utterance
        (text encoder + duration predictor only). Lets the serving layer
        pick the exact output-frame bucket before the expensive decode.
        Shares _duration_head with _infer_latents so probe and decode
        can never disagree."""
        return self._duration_head(x, x_lengths, sid, length_scale,
                                   noise_scale_w)[-1]

    def infer(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
        noise_scale: float = 1.0,
        length_scale: float = 1.0,
        noise_scale_w: float = 1.0,
        max_frames: int = 1000,
    ) -> InferOutput:
        z, z_p, m_p, logs_p, attn, y_mask, y_lengths, g = self._infer_latents(
            x, x_lengths, sid, noise_scale, length_scale, noise_scale_w,
            max_frames,
        )
        o, o_mb, spec, phase = self.dec(z * y_mask, g=g)
        return InferOutput(o, o_mb, spec, phase, attn, y_mask, y_lengths,
                           (z, z_p, m_p, logs_p))

    def infer_z_only(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
        noise_scale: float = 1.0,
        length_scale: float = 1.0,
        noise_scale_w: float = 1.0,
        max_frames: int = 1000,
    ):
        """Latents only — basis for chunked/streaming decoding
        (reference models.py:742-788)."""
        z, z_p, m_p, logs_p, attn, y_mask, y_lengths, _ = self._infer_latents(
            x, x_lengths, sid, noise_scale, length_scale, noise_scale_w,
            max_frames,
        )
        return attn, y_mask, y_lengths, (z, z_p, m_p, logs_p)

    def decode(
        self,
        z: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
        y_mask: Optional[jnp.ndarray] = None,
    ):
        """Decoder-only: z [B, T, C] -> waveform. The chunked-streaming
        building block (repairs reference synthesis_module.py:306-353)."""
        g = self._speaker(sid)
        if y_mask is not None:
            z = z * y_mask
        return self.dec(z, g=g)

    def decode_spec_tail(self, spec: jnp.ndarray, phase: jnp.ndarray):
        """The decoder head's back half — (spec, phase) to waveform —
        for the serving spec-domain join (infer/synthesis.py
        decode_spec_join): runs the decoder's OWN tail code/params, so
        the join cannot diverge from the forward pass."""
        return self.dec.spec_tail(spec, phase)

    def reconstruct(
        self,
        y: jnp.ndarray,
        y_lengths: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
    ):
        """Copy-synthesis: posterior-encode the ground-truth spectrogram
        and decode z back to a waveform. Output is time-aligned with the
        input utterance, so objective fidelity metrics (MCD / F0 / LSD
        vs ground truth) are well-defined — unlike `infer`, whose
        predicted durations de-align it from the reference audio."""
        g = self._speaker(sid)
        z, _, _, y_mask = self.enc_q(y, y_lengths, g=g,
                                     noise_rng=self.make_rng("noise"))
        o, _, _, _ = self.dec(z * y_mask, g=g)
        return o, y_mask

    def voice_conversion(
        self,
        y: jnp.ndarray,
        y_lengths: jnp.ndarray,
        sid_src: jnp.ndarray,
        sid_tgt: jnp.ndarray,
    ):
        """Latent-space speaker swap (reference models.py:790-798)."""
        assert self.cfg.n_speakers > 1, (
            "voice conversion needs a multi-speaker model (n_speakers > 1)"
        )
        g_src = self.emb_g(sid_src)[:, None, :]
        g_tgt = self.emb_g(sid_tgt)[:, None, :]
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, g=g_src,
                                            noise_rng=self.make_rng("noise"))
        z_p = self.flow(z, y_mask, g=g_src)
        z_hat = self.flow(z_p, y_mask, g=g_tgt, reverse=True)
        o_hat, o_hat_mb, spec, phase = self.dec(z_hat * y_mask, g=g_tgt)
        return o_hat, o_hat_mb, y_mask, (z, z_p, z_hat)
