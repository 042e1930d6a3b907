"""Model families: VITS synthesizer (3 iSTFT decoder variants) and the
multi-period discriminator."""

from mb_istft_vits_tpu.models.synthesizer import Synthesizer, InferOutput  # noqa: F401
from mb_istft_vits_tpu.models.discriminator import MultiPeriodDiscriminator  # noqa: F401
from mb_istft_vits_tpu.models.decoders import (  # noqa: F401
    ISTFTGenerator,
    MultibandISTFTGenerator,
    MultistreamISTFTGenerator,
)
