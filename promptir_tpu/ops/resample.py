"""Pixel-(un)shuffle resampling in NHWC.

Behavioral parity targets: reference `Downsample`/`Upsample`
(/root/reference/net/model.py:160-178) which are 3x3 conv + torch
PixelUnshuffle(2)/PixelShuffle(2) in NCHW. Here the shuffles are pure
reshape/transpose in NHWC (free for XLA to fuse into the neighbouring
convs); the channel ordering matches torch's `c*r*r + i*r + j` convention
so converted checkpoints line up exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.ops.conv import Conv, Dense


def pixel_unshuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/r,W/r,C*r*r), out channel = c*r*r + i*r + j."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    # (b, h', i, w', j, c) -> (b, h', w', c, i, j)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B,H,W,C*r*r) -> (B,H*r,W*r,C); inverse of :func:`pixel_unshuffle`."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    # (b, h, w, c, i, j) -> (b, h, i, w, j, c)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


class Downsample(nn.Module):
    """3x3 conv C -> C/2 then 2x pixel-unshuffle (net: 2C channels at H/2)."""

    n_feat: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv(
            self.n_feat // 2,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="body_0",
        )(x)
        return pixel_unshuffle(x, 2)


class Upsample(nn.Module):
    """3x3 conv C -> 2C then 2x pixel-shuffle (net: C/2 channels at 2H)."""

    n_feat: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv(
            self.n_feat * 2,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="body_0",
        )(x)
        return pixel_shuffle(x, 2)
