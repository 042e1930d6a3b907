"""Inference / serving layer."""

from mb_istft_vits_tpu.infer.synthesis import SynthesisModule, get_synthesis_module_instance  # noqa: F401
