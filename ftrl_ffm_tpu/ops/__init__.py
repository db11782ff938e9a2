from ftrl_ffm_tpu.ops.interactions import (
    ffm_logits_and_grads,
    fm_logits_and_grads,
    linear_logits,
)
from ftrl_ffm_tpu.ops.layout import kmajor_to_reference, reference_to_kmajor

__all__ = [
    "linear_logits",
    "fm_logits_and_grads",
    "ffm_logits_and_grads",
    "kmajor_to_reference",
    "reference_to_kmajor",
]
