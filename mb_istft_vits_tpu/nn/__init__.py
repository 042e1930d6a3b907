"""Neural building blocks (flax.linen), channels-last [B, T, C] layout.

TPU-first conventions:
  - all sequence tensors are [batch, time, channels] so LayerNorm/matmul hit
    the lane dimension naturally (no transposes like reference modules.py:29-32)
  - masks are [B, T, 1] float
  - dropout/noise take explicit PRNG via flax rng collections
"""

from mb_istft_vits_tpu.nn.layers import (  # noqa: F401
    Conv1d,
    ConvTranspose1d,
    LayerNorm,
    LRELU_SLOPE,
)
from mb_istft_vits_tpu.nn.blocks import (  # noqa: F401
    ConvReluNorm,
    DDSConv,
    WN,
    ResBlock1,
    ResBlock2,
)
from mb_istft_vits_tpu.nn.attention import (  # noqa: F401
    FFN,
    MultiHeadAttention,
    TransformerDecoder,
    TransformerEncoder,
    attention_bias_proximal,
    subsequent_mask,
)
from mb_istft_vits_tpu.nn.flows import (  # noqa: F401
    Log,
    ElementwiseAffine,
    ResidualCouplingLayer,
    ConvFlow,
    flip_channels,
)
