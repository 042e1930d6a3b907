"""Core tensor ops: monotonic alignment search, segment slicing, path
generation. All on-device and jit-compatible — the reference's
GPU→CPU→C-kernel→GPU roundtrip (monotonic_align/__init__.py:13-19) is gone.
"""

from mb_istft_vits_tpu.ops.mas import maximum_path  # noqa: F401
from mb_istft_vits_tpu.ops.segments import (  # noqa: F401
    add_timing_signal_1d,
    cat_timing_signal_1d,
    generate_path,
    get_timing_signal_1d,
    rand_slice_segments,
    sequence_mask,
    slice_segments,
)
