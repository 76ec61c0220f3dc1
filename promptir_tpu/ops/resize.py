"""Bilinear resize with PyTorch `F.interpolate(mode="bilinear")` semantics.

The reference prompt-generation modules resize the mixed prompt to the
feature resolution with torch bilinear interpolation — align_corners=False
in the canonical model (/root/reference/net/model.py:232) and
align_corners=True in the XRestormer flavor
(/root/reference/net/prompt_xrestormer.py:351). `jax.image.resize` is not
bit-compatible with either across all shapes, so this implementation
reproduces both.

Computation: bilinear interpolation is LINEAR in the input, so the resize
is two small dense matmuls, out = A_h @ x @ A_w^T, where each interpolation
matrix row holds the (1-t, t) lerp weights of one output coordinate. On TPU
this replaces the gather / lerp / transpose pipeline XLA emits for the
take-based form (measured 5.5 ms/iter for the 64->256 prompt resize at
batch 16 — fusion.8/9 row gathers + lerp fusions + 4 layout copies) with
two MXU dots in one streaming pass; the matrices depend only on shapes, so
XLA constant-folds them. Numerics: matmul accumulates w_lo*lo + w_hi*hi in
fp32 vs the lerp's lo + (hi-lo)*t — identical up to one fp32 rounding
(<1e-7 on [0,1] data; golden tolerance is 2e-5).
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


def _interp_matrix(out_size: int, in_size: int, align_corners: bool):
    """(out_size, in_size) fp32 matrix M with M @ x == bilinear resize of x
    along that axis; each row has the two lerp weights (they coincide and
    sum at boundary rows where lo == hi)."""
    lo, hi, w_hi = _axis_weights(out_size, in_size, align_corners)
    rows = jnp.arange(out_size)
    m = jnp.zeros((out_size, in_size), jnp.float32)
    m = m.at[rows, lo].add(1.0 - w_hi)
    m = m.at[rows, hi].add(w_hi)
    return m


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
    out = x.astype(jnp.float32)
    if oh != h:
        a_h = _interp_matrix(oh, h, align_corners)
        out = jnp.einsum("Oh,bhwc->bOwc", a_h, out)
    if ow != w:
        a_w = _interp_matrix(ow, w, align_corners)
        out = jnp.einsum("Ww,bowc->boWc", a_w, out)
    return out.astype(dtype)
