"""Streaming TTS serving."""

from mb_istft_vits_tpu.serve.microbatch import MicroBatcher  # noqa: F401
from mb_istft_vits_tpu.serve.streaming import IncrementalTTS, TTSRequest  # noqa: F401
