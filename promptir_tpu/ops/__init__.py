"""Core NHWC ops for TPU-native image restoration.

Each op mirrors the *behavior* of a reference block (citations in each
docstring point at /root/reference for the parity oracle) but is designed
for XLA/TPU: channels-last layout (channels on lanes), einsum-based
attention that lands on the MXU, reshape/transpose pixel-shuffles, and
static-shape control flow.
"""

from promptir_tpu.ops.resample import (
    pixel_shuffle,
    pixel_unshuffle,
    Downsample,
    Upsample,
)
from promptir_tpu.ops.resize import resize_bilinear
from promptir_tpu.ops.norm import RestormerLayerNorm, layernorm_nhwc
from promptir_tpu.ops.attention import MDTA
from promptir_tpu.ops.gdfn import GDFN
from promptir_tpu.ops.embed import OverlapPatchEmbed
from promptir_tpu.ops.prompt import PromptGenBlock

__all__ = [
    "pixel_shuffle",
    "pixel_unshuffle",
    "Downsample",
    "Upsample",
    "resize_bilinear",
    "RestormerLayerNorm",
    "layernorm_nhwc",
    "MDTA",
    "GDFN",
    "OverlapPatchEmbed",
    "PromptGenBlock",
]
