"""Observability utilities.

Behavior contract: reference `utils.py:63-136` (TensorBoard summarize,
spectrogram/alignment plotters) and the debug affordances of the trainer
(`torch.autograd.set_detect_anomaly`, train_latest.py:40 → here
jax.debug_nans; hand-rolled stage timing → here jax.profiler traces,
SURVEY.md §5.1-5.2).
"""

from __future__ import annotations

import contextlib
import io
import wave
from typing import Dict, Optional

import numpy as np


def encode_wav_bytes(audio: np.ndarray, sampling_rate: int) -> bytes:
    """float [-1, 1] mono -> 16-bit PCM WAV bytes (stdlib only)."""
    from mb_istft_vits_tpu.utils.audio import float_to_int16

    pcm16 = float_to_int16(np.asarray(audio).reshape(-1)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sampling_rate)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def _add_audio(writer, tag: str, audio: np.ndarray, global_step: int,
               sampling_rate: int) -> None:
    """TensorBoard audio summary without the soundfile dependency
    (tensorboardX's add_audio imports soundfile, which is not in this
    image): encode the WAV with the stdlib and emit the Summary proto
    directly."""
    try:
        from tensorboardX.proto.summary_pb2 import Summary

        wav_bytes = encode_wav_bytes(audio, sampling_rate)
        audio_proto = Summary.Audio(
            sample_rate=sampling_rate,
            num_channels=1,
            length_frames=len(np.asarray(audio).reshape(-1)),
            encoded_audio_string=wav_bytes,
            content_type="audio/wav",
        )
        summary = Summary(value=[Summary.Value(tag=tag, audio=audio_proto)])
        writer.file_writer.add_summary(summary, global_step)
    except Exception:
        # last resort: the stock path (works where soundfile exists)
        writer.add_audio(tag, np.asarray(audio), global_step, sampling_rate)


def summarize(
    writer,
    global_step: int,
    scalars: Optional[Dict] = None,
    histograms: Optional[Dict] = None,
    images: Optional[Dict] = None,
    audios: Optional[Dict] = None,
    audio_sampling_rate: int = 22050,
) -> None:
    """TensorBoard logging (reference utils.py:63-71); writer is a
    tensorboardX SummaryWriter."""
    for k, v in (scalars or {}).items():
        writer.add_scalar(k, float(v), global_step)
    for k, v in (histograms or {}).items():
        writer.add_histogram(k, np.asarray(v), global_step)
    for k, v in (images or {}).items():
        writer.add_image(k, v, global_step, dataformats="HWC")
    for k, v in (audios or {}).items():
        _add_audio(writer, k, np.asarray(v), global_step,
                   audio_sampling_rate)


def _render_figure(fig) -> np.ndarray:
    fig.canvas.draw()
    data = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    return data.reshape(h, w, 4)[..., :3].copy()


def plot_spectrogram_to_numpy(spectrogram: np.ndarray) -> np.ndarray:
    """[n_mels, F] -> HWC uint8 image (reference utils.py:82-107)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(np.asarray(spectrogram), aspect="auto", origin="lower",
                   interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.xlabel("Frames")
    plt.ylabel("Channels")
    plt.tight_layout()
    data = _render_figure(fig)
    plt.close(fig)
    return data


def plot_alignment_to_numpy(alignment: np.ndarray,
                            info: Optional[str] = None) -> np.ndarray:
    """[T_y, T_x] -> HWC uint8 image (reference utils.py:110-136)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(np.asarray(alignment).T, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    xlabel = "Decoder timestep"
    if info is not None:
        xlabel += "\n\n" + info
    plt.xlabel(xlabel)
    plt.ylabel("Encoder timestep")
    plt.tight_layout()
    data = _render_figure(fig)
    plt.close(fig)
    return data


def enable_nan_debugging() -> None:
    """jax equivalent of the reference's always-on autograd anomaly mode
    (train_latest.py:40): raise on NaN/Inf in any jitted computation.
    jax_debug_nans alone only traps NaN — an overflow to +/-inf (the
    usual first symptom of divergence) needs jax_debug_infs too."""
    import jax

    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) —
    the structured replacement for the reference's time.time() stage dict
    (models.py:698-737)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
