"""Padding helpers for full-image inference.

Two reference behaviors, both reproduced exactly:
  * `pad_to_multiple_flip` — the test-time "flip pad": append the
    spatially flipped image and crop to the target size
    (/root/reference/test.py:100-104). Equivalent to symmetric padding.
  * `pad_to_multiple_reflect` — demo-time reflect pad to a multiple of 8
    (/root/reference/demo.py:17-24), torch `F.pad(mode="reflect")`.
"""

from __future__ import annotations

import jax.numpy as jnp


def target_size(h: int, w: int, base) -> tuple[int, int]:
    """Next (H, W) multiples of `base` — one int for both dims, or a
    (base_h, base_w) pair (spatial sharding constrains H more than W)."""
    bh, bw = (base, base) if isinstance(base, int) else base
    return (
        (h + bh - 1) // bh * bh,
        (w + bw - 1) // bw * bw,
    )


def pad_to_multiple_flip(x: jnp.ndarray, base: int = 64) -> jnp.ndarray:
    """NHWC flip-concat pad so H and W are multiples of `base`."""
    _, h, w, _ = x.shape
    th, tw = target_size(h, w, base)
    if th != h:
        x = jnp.concatenate([x, x[:, ::-1, :, :]], axis=1)[:, :th]
    if tw != w:
        x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=2)[:, :, :tw]
    return x


def pad_to_multiple_reflect(x: jnp.ndarray, base: int = 8) -> jnp.ndarray:
    """NHWC reflect pad (no edge duplication) to multiples of `base`."""
    _, h, w, _ = x.shape
    th, tw = target_size(h, w, base)
    return jnp.pad(
        x,
        ((0, 0), (0, th - h), (0, tw - w), (0, 0)),
        mode="reflect",
    )


def crop(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return x[:, :h, :w, :]
