"""Low-level TPU-first neural-net primitives (reference layer L1)."""

from phenaki_tpu.ops.norms import LayerNorm, l2norm
from phenaki_tpu.ops.feedforward import FeedForward, geglu
from phenaki_tpu.ops.positional import (
    AlibiPositionalBias,
    ContinuousPositionBias,
    PEG,
    alibi_slopes,
)
from phenaki_tpu.ops.attention import Attention, qk_norm_attention
from phenaki_tpu.ops.quantize import LFQ, VectorQuantize
from phenaki_tpu.ops.sampling import (
    gumbel_sample,
    get_mask_subset_with_prob,
    topk_mask,
    cosine_schedule,
)

__all__ = [
    "LayerNorm",
    "l2norm",
    "FeedForward",
    "geglu",
    "AlibiPositionalBias",
    "ContinuousPositionBias",
    "PEG",
    "alibi_slopes",
    "Attention",
    "qk_norm_attention",
    "LFQ",
    "VectorQuantize",
    "gumbel_sample",
    "get_mask_subset_with_prob",
    "topk_mask",
    "cosine_schedule",
]
