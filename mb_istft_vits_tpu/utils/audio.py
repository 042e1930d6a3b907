"""Host-side PCM helpers shared by every float->int16 conversion site
(streaming chunks, TensorBoard WAV encoding, CLI wav writers). One
definition so all paths quantize identically — truncation vs rounding
differ by up to 1 LSB of signal-correlated bias."""

from __future__ import annotations

import numpy as np


def float_to_int16(audio: np.ndarray) -> np.ndarray:
    """float [-1, 1] -> int16 PCM with round-to-nearest (matches the
    on-device quantization in infer/synthesis.py's serving programs)."""
    pcm = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
    return np.round(pcm * 32767.0).astype(np.int16)
