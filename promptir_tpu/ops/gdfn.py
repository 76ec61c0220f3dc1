"""GDFN — gated depthwise-conv feed-forward network, NHWC.

Parity target: /root/reference/net/model.py:82-99. 1x1 conv to
2*int(dim*expansion) channels, 3x3 depthwise conv, split channels in two,
`gelu(x1) * x2` gate, 1x1 conv back to dim. This is the largest FLOPs
share of each transformer block; the 1x1 convs are batched matmuls on the
MXU and XLA fuses the depthwise conv + gate elementwise chain.

Note: torch `F.gelu` is the exact (erf) gelu — `approximate=False` here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.ops.conv import Conv, Dense


class GDFN(nn.Module):
    dim: int
    expansion: float = 2.66
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.dim * self.expansion)
        y = Conv(
            hidden * 2, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            name="project_in",
        )(x)
        y = Conv(
            hidden * 2,
            (3, 3),
            padding=((1, 1), (1, 1)),
            feature_group_count=hidden * 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="dwconv",
        )(y)
        y1, y2 = jnp.split(y, 2, axis=-1)
        y = jax.nn.gelu(y1, approximate=False) * y2
        return Conv(
            self.dim, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            name="project_out",
        )(y)
