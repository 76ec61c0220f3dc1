"""Restormer-style channel LayerNorm for NHWC feature maps.

Parity target: the reference normalizes over the channel axis after a
`b c h w -> b (h w) c` reshape, with `var(unbiased=False)` and eps=1e-5
*inside* the sqrt (/root/reference/net/model.py:27-76). Two flavors:
  * bias-free: x / sqrt(var + eps) * weight            (no mean subtraction)
  * with-bias: (x - mean) / sqrt(var + eps) * weight + bias

In NHWC this is a plain last-axis normalization — no layout change needed,
and XLA fuses it into the adjacent convs. Statistics are computed in
float32 regardless of the compute dtype.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def layernorm_nhwc(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    *,
    bias_free: bool,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Normalize the last (channel) axis of `x` with Restormer semantics."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if bias_free:
        # biased variance about the mean, but the mean is NOT subtracted
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = xf / jnp.sqrt(var + eps) * weight.astype(jnp.float32)
    else:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + eps)
        y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


class RestormerLayerNorm(nn.Module):
    """Channel LayerNorm; `bias_free=True` gives the 'BiasFree' variant."""

    dim: int
    bias_free: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = None
        if not self.bias_free:
            bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return layernorm_nhwc(
            x, weight, bias, bias_free=self.bias_free, eps=self.eps
        )
