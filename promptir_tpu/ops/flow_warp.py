"""Optical-flow bilinear warp (basicsr `flow_warp` equivalent), NHWC.

Used by CAMixer v1's deformable keys: k = x + flow_warp(x, offsets)
(/root/reference/net/camixer_prompt_xrestormer_eff.py:418). Semantics match
torch `grid_sample(align_corners=True, padding_mode='border')`: sample at
(grid + flow) pixel positions, clamped to the image border.
"""

from __future__ import annotations

import jax.numpy as jnp


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """x: (B,H,W,C); flow: (B,H,W,2) with (dx, dy) pixel offsets."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    px = jnp.clip(gx[None] + flow[..., 0].astype(jnp.float32), 0.0, w - 1.0)
    py = jnp.clip(gy[None] + flow[..., 1].astype(jnp.float32), 0.0, h - 1.0)

    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = px - x0
    wy = py - y0

    def gather(yy, xx):
        flat = xf.reshape(b, h * w, c)
        idx = yy * w + xx  # (B,H,W)
        return jnp.take_along_axis(
            flat, idx.reshape(b, h * w, 1), axis=1
        ).reshape(b, h, w, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 + (v01 - v00) * wx[..., None]
    bot = v10 + (v11 - v10) * wx[..., None]
    out = top + (bot - top) * wy[..., None]
    return out.astype(x.dtype)
