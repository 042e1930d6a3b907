"""Pure-jnp DSP primitives: STFT/iSTFT, PQMF filterbank, mel spectrograms.

All functions are jittable with static shapes; filter/window/basis design
happens at trace time in numpy and becomes XLA constants.
"""

from mb_istft_vits_tpu.dsp.stft import (  # noqa: F401
    hann_window,
    stft,
    stft_magnitude,
    istft,
    spectrogram,
)
from mb_istft_vits_tpu.dsp.pqmf import PQMFBank, design_prototype_filter  # noqa: F401
from mb_istft_vits_tpu.dsp.mel import (  # noqa: F401
    mel_filterbank,
    spec_to_mel,
    mel_spectrogram,
    spectral_normalize,
)
from mb_istft_vits_tpu.dsp.resample import (  # noqa: F401
    PolyphaseStreamResampler,
    design_resample_filter,
    resample_poly,
    resample_poly_jax,
)
