"""Overlapped patch embedding: a stride-1 3x3 conv from RGB to `dim`.

Parity target: /root/reference/net/model.py:202-211.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.ops.conv import Conv, Dense


class OverlapPatchEmbed(nn.Module):
    embed_dim: int = 48
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Conv(
            self.embed_dim,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="proj",
        )(x)
