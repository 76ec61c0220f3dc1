"""Bilinear resize with PyTorch `F.interpolate(mode="bilinear")` semantics.

The reference prompt-generation modules resize the mixed prompt to the
feature resolution with torch bilinear interpolation — align_corners=False
in the canonical model (/root/reference/net/model.py:232) and
align_corners=True in the XRestormer flavor
(/root/reference/net/prompt_xrestormer.py:351). `jax.image.resize` is not
bit-compatible with either across all shapes, so this gather+lerp
implementation reproduces both exactly. Resizes here are small (prompt
maps, <=64px) so a dense gather is cheap and XLA-friendly (static shapes).
"""

from __future__ import annotations

import jax.numpy as jnp


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    dst = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), jnp.float32)
        scale = (in_size - 1) / (out_size - 1)
        return dst * scale
    scale = in_size / out_size
    src = (dst + 0.5) * scale - 0.5
    return src


def _axis_weights(out_size: int, in_size: int, align_corners: bool):
    src = _source_coords(out_size, in_size, align_corners)
    # torch clamps the *interpolation weight* computation to the valid range
    # by clamping indices; negative src behaves as src=0 (weight clamp).
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w_hi = src - lo.astype(jnp.float32)
    return lo, hi, w_hi


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize NHWC `x` to (H_out, W_out) with torch-bilinear semantics."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    lo_h, hi_h, wh = _axis_weights(oh, h, align_corners)
    lo_w, hi_w, ww = _axis_weights(ow, w, align_corners)

    top = jnp.take(xf, lo_h, axis=1)
    bot = jnp.take(xf, hi_h, axis=1)
    rows = top + (bot - top) * wh[None, :, None, None]

    left = jnp.take(rows, lo_w, axis=2)
    right = jnp.take(rows, hi_w, axis=2)
    out = left + (right - left) * ww[None, None, :, None]
    return out.astype(dtype)
