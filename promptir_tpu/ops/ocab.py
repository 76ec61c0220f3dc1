"""OCAB — overlapping cross-attention block (X-Restormer spatial attention).

Parity target: /root/reference/net/xrestormer.py:12-74,215-283. Queries
come from non-overlapping `win x win` windows; keys/values from zero-padded
overlapping `ow x ow` windows (ow = win + win*overlap_ratio, stride win —
torch `nn.Unfold`), with a content-dependent 2D relative position bias
(BoTNet-style `rel_to_abs` indexing) added to the logits.

TPU-first formulation: windows are extracted with reshapes and two static
shifted slices (no im2col materialization beyond the k/v halo, which is
inherent to the op); attention is a batched (win^2 x ow^2) einsum over
(B * num_windows * heads) — MXU-shaped, fixed size, cost linear in pixels.
The relative bias uses a precomputed static gather index instead of the
reference's pad/reshape trick — same math, better layout.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.ops.conv import Conv


def extract_overlapping_windows(
    x: jnp.ndarray, win: int, ow: int, h_prepadded: bool = False
) -> jnp.ndarray:
    """(B,H,W,C) -> (B, nh*nw, ow*ow, C): zero-padded halo windows.

    Window i covers rows [i*win - pad, i*win - pad + ow) with
    pad = (ow - win)//2, matching torch Unfold(kernel=ow, stride=win,
    padding=pad). `h_prepadded=True` means x already carries the `pad`
    top/bottom rows (the spatially-sharded caller supplies neighbor rows
    there instead of zeros); only W is padded then.
    """
    b, h, w, c = x.shape
    pad = (ow - win) // 2
    if h_prepadded:
        h = h - 2 * pad
    nh, nw = h // win, w // win
    hpad = (0, 0) if h_prepadded else (pad, pad)
    xp = jnp.pad(x, ((0, 0), hpad, (pad, pad), (0, 0)))
    # Gather along H: rows for window i are i*win + (0..ow-1) in padded coords
    row_idx = (np.arange(nh)[:, None] * win + np.arange(ow)[None, :]).reshape(-1)
    col_idx = (np.arange(nw)[:, None] * win + np.arange(ow)[None, :]).reshape(-1)
    xr = jnp.take(xp, jnp.asarray(row_idx), axis=1)  # (B, nh*ow, W+2p, C)
    xrc = jnp.take(xr, jnp.asarray(col_idx), axis=2)  # (B, nh*ow, nw*ow, C)
    xrc = xrc.reshape(b, nh, ow, nw, ow, c)
    return xrc.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, ow * ow, c)


class RelPosEmb(nn.Module):
    """Content-dependent 2D relative position bias (xrestormer.py:48-74).

    For q at in-window position (x, y) and k at halo position (i, j), the
    bias is q . rel_width[j - y + shift] + q . rel_height[i - x + shift]
    with shift = rel_size - 1 + offset such that it reproduces the
    reference's rel_to_abs indexing exactly (verified by golden test).
    """

    block_size: int
    rel_size: int
    dim_head: int

    @nn.compact
    def __call__(self, q: jnp.ndarray) -> jnp.ndarray:
        """q: (N, win*win, d) -> bias (N, win*win, rel_size*rel_size)."""
        win = self.block_size
        rs = self.rel_size
        scale = self.dim_head ** -0.5
        init = lambda key, shape: jax.random.normal(key, shape) * scale
        rel_h = self.param("rel_height", init, (rs * 2 - 1, self.dim_head))
        rel_w = self.param("rel_width", init, (rs * 2 - 1, self.dim_head))

        n = q.shape[0]
        qg = q.reshape(n, win, win, self.dim_head)

        # The reference's rel_to_abs on (b, l=win, m=2*rs-1) keeps, for
        # query position y and key position j, relative index j - y + rs-1.
        j_idx = np.arange(rs)[None, :] - np.arange(win)[:, None] + rs - 1
        j_idx = jnp.asarray(j_idx)  # (win, rs), values in [0, 2*rs-2]

        # width bias: depends on (query col y, key col j); uniform in key row
        logits_w = jnp.einsum("nxyd,rd->nxyr", qg, rel_w)  # (n, x, y, 2rs-1)
        idx = jnp.broadcast_to(j_idx[None, None], (n, win, win, rs))
        bias_w = jnp.take_along_axis(logits_w, idx, axis=3)  # (n, x, y, j)
        bias_w = jnp.broadcast_to(
            bias_w[:, :, :, None, :], (n, win, win, rs, rs)
        )  # (n, x, y, i, j)

        # height bias: depends on (query row x, key row i); uniform in key col
        logits_h = jnp.einsum("nxyd,rd->nyxr", qg, rel_h)  # (n, y, x, 2rs-1)
        bias_h = jnp.take_along_axis(logits_h, idx, axis=3)  # (n, y, x, i)
        bias_h = bias_h.transpose(0, 2, 1, 3)  # (n, x, y, i)
        bias_h = jnp.broadcast_to(
            bias_h[:, :, :, :, None], (n, win, win, rs, rs)
        )  # (n, x, y, i, j)

        out = (bias_w + bias_h).reshape(n, win * win, rs * rs)
        return out


class OCAB(nn.Module):
    dim: int
    window_size: int = 8
    overlap_ratio: float = 0.5
    num_heads: int = 2
    dim_head: int = 16
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        win = self.window_size
        ow = int(win * self.overlap_ratio) + win
        inner = self.dim_head * self.num_heads
        nh, nw = h // win, w // win
        nwin = nh * nw

        qkv = Conv(
            inner * 3, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            name="qkv",
        )(x)
        qs, ks, vs = jnp.split(qkv, 3, axis=-1)

        # q: non-overlapping windows -> (B, nwin, win^2, inner)
        qs = qs.reshape(b, nh, win, nw, win, inner)
        qs = qs.transpose(0, 1, 3, 2, 4, 5).reshape(b, nwin, win * win, inner)
        # Under a spatial-sharding trace (parallel/spatial.py): q windows
        # are shard-local (stripe heights divide `win`); the k/v halo rows
        # come from the neighbor shards over ICI instead of the zero pad —
        # zeros remain at the global borders, so this is bit-identical to
        # the reference's Unfold zero padding.
        from promptir_tpu.parallel.spatial import (
            current_spatial_axis,
            exchange_rows,
        )

        axis = current_spatial_axis()
        if axis is not None:
            assert h % win == 0, (
                f"sharded OCAB needs stripe height {h} divisible by the "
                f"window size {win}"
            )
            pad = (ow - win) // 2
            ks = extract_overlapping_windows(
                exchange_rows(ks, pad, axis), win, ow, h_prepadded=True
            )
            vs = extract_overlapping_windows(
                exchange_rows(vs, pad, axis), win, ow, h_prepadded=True
            )
        else:
            ks = extract_overlapping_windows(ks, win, ow)
            vs = extract_overlapping_windows(vs, win, ow)

        # split heads: channel = head*dim_head + c (reference '(head c)')
        d = self.dim_head
        hd = self.num_heads
        dtype = qs.dtype

        def heads(t, m):
            return t.reshape(b, nwin, m, hd, d)

        # scale in the compute dtype; attention logits accumulate in fp32
        qs = heads(qs, win * win) * jnp.asarray(d ** -0.5, dtype)
        ks = heads(ks, ow * ow)
        vs = heads(vs, ow * ow)

        attn = jnp.einsum(
            "bwqhd,bwkhd->bwhqk", qs, ks, preferred_element_type=jnp.float32
        )
        # bias is per (window*head); reference computes it on scaled q
        q_flat = qs.transpose(0, 1, 3, 2, 4).reshape(
            b * nwin * hd, win * win, d
        )
        bias = RelPosEmb(win, ow, d, name="rel_pos_emb")(q_flat)
        attn = attn + bias.reshape(b, nwin, hd, win * win, ow * ow)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bwhqk,bwkhd->bwqhd", attn.astype(dtype), vs,
            preferred_element_type=jnp.float32,
        )

        out = out.reshape(b, nh, nw, win, win, inner).astype(x.dtype)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, inner)
        return Conv(
            self.dim, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            name="project_out",
        )(out)
