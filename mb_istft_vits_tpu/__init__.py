"""MB-iSTFT-VITS TPU: a TPU-native (JAX/XLA/Pallas/pjit) text-to-speech framework.

A from-scratch reimplementation of the capabilities of OER-9000/MB-iSTFT-VITS
(conditional-VAE + normalizing-flow + GAN TTS with an inverse-STFT vocoder
head, optionally multi-band (fixed PQMF) or multi-stream (trainable filters)),
designed TPU-first:

  - all compute paths are jit-compatible pure functions over static shapes
  - channels-last [B, T, C] layout throughout (MXU/VPU friendly)
  - monotonic alignment search runs on-device (lax.scan wavefront or Pallas)
  - data parallelism via jax.sharding.Mesh + NamedSharding (ICI collectives)

Reference behavior contract: /root/reference (file:line cites in docstrings).
"""

__version__ = "0.1.0"

from mb_istft_vits_tpu.config import HParams, load_hparams  # noqa: F401
