"""Observability: logging, TensorBoard summaries, plots, profiling,
NaN debugging."""

from mb_istft_vits_tpu.utils.observability import (  # noqa: F401
    enable_nan_debugging,
    plot_alignment_to_numpy,
    plot_spectrogram_to_numpy,
    profile_trace,
    summarize,
)
