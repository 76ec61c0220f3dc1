"""Shared Restormer-family building blocks.

Parity targets: TransformerBlock (/root/reference/net/model.py:183-196) and
the checkpoint-resident-but-unused ("dead") 1x1 convs of PromptIR
(/root/reference/net/model.py:271-287) which must exist in the param tree
for 1:1 checkpoint mapping.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.ops.attention import MDTA
from promptir_tpu.ops.gdfn import GDFN
from promptir_tpu.ops.norm import RestormerLayerNorm
from promptir_tpu.utils.init import torch_kernel_init


class TransformerBlock(nn.Module):
    """x += MDTA(LN(x)); x += GDFN(LN(x))."""

    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_norm: bool = False  # reference 'LayerNorm_type' WithBias default
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = RestormerLayerNorm(self.dim, self.bias_free_norm, name="norm1")(x)
        x = x + MDTA(
            self.dim, self.num_heads, self.use_bias, self.dtype, name="attn"
        )(y)
        y = RestormerLayerNorm(self.dim, self.bias_free_norm, name="norm2")(x)
        x = x + GDFN(
            self.dim, self.expansion, self.use_bias, self.dtype, name="ffn"
        )(y)
        return x


class DeadConv(nn.Module):
    """Declares a 1x1 conv's params without computing anything.

    The reference PromptIR instantiates several convs it never calls in
    forward (net/model.py:271-287); released checkpoints contain their
    weights, so the param tree must too. XLA dead-code-eliminates these.
    """

    cin: int
    cout: int
    use_bias: bool = False

    @nn.compact
    def __call__(self) -> None:
        self.param("kernel", torch_kernel_init, (1, 1, self.cin, self.cout))
        if self.use_bias:
            self.param("bias", nn.initializers.zeros, (self.cout,))
        return None
