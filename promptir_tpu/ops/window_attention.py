"""Uformer building blocks: window MSA, LeFF, shift masks, projections.

Parity targets in /root/reference/net/prompt_uformer.py:
  * `WindowAttention` (:452-546): 8x8 window MSA, LinearProjection qkv
    (to_q + to_kv, bias), learned relative-position-bias table indexed by a
    static (win^2, win^2) map, optional additive attention mask;
  * `LeWinTransformerBlock` (:846-1008): pre-LN (standard torch LayerNorm),
    optional cyclic shift with the Swin boundary mask, optional per-window
    `modulator` embedding added to attention input, LeFF/MLP FFN,
    stochastic depth (DropPath);
  * `LeFF` (:654-688): Linear+GELU -> depthwise 3x3 on the token grid
    +GELU -> Linear;
  * `Mlp` (:623-651), `SepConv2d`/`ConvProjection` (:344-398);
  * window partition/reverse (:704-727); Down/Up/Input/Output projections
    (:730-846).

TPU-first notes: features stay NHWC; "tokens" are just the flattened view
inside attention. Window partition is reshape/transpose; the shift mask is
a static numpy table per (H, W) trace; all attention is one batched
(B*nW, heads, win^2, win^2) einsum chain on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from promptir_tpu.ops.conv import Conv, Dense


class TorchLayerNorm(nn.Module):
    """Standard LayerNorm over the channel axis, torch naming (weight/bias),
    eps 1e-5 (torch nn.LayerNorm default)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + self.eps)
        return (y * w + b).astype(x.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics). Identity when
    deterministic or rate 0."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B*nH*nW, win*win, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win * win, c)


def window_reverse(windows: jnp.ndarray, win: int, h: int, w: int) -> jnp.ndarray:
    """(B*nH*nW, win*win, C) -> (B,H,W,C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // win) * (w // win))
    x = windows.reshape(b, h // win, w // win, win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(win: int) -> np.ndarray:
    """Static (win^2, win^2) index into the (2win-1)^2 bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(win), np.arange(win), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += win - 1
    rel[:, :, 1] += win - 1
    rel[:, :, 0] *= 2 * win - 1
    return rel.sum(-1)


def shift_attn_mask(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """Static Swin shifted-window mask: (nW, win^2, win^2) of {0, -100}."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(h // win, win, w // win, win).transpose(0, 2, 1, 3)
    img = img.reshape(-1, win * win)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class LinearProjection(nn.Module):
    """to_q / to_kv linear qkv (reference LinearProjection, :423-446)."""

    dim: int
    heads: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_kv=None):
        bn, n, c = x.shape
        d = self.dim // self.heads
        kv_src = x if attn_kv is None else jnp.broadcast_to(
            attn_kv[None], (bn,) + attn_kv.shape
        )
        q = Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype,
                  name="to_q")(x)
        kv = Dense(self.dim * 2, use_bias=self.use_bias, dtype=self.dtype,
                   name="to_kv")(kv_src)
        n_kv = kv_src.shape[1]
        q = q.reshape(bn, n, self.heads, d).transpose(0, 2, 1, 3)
        kv = kv.reshape(bn, n_kv, 2, self.heads, d).transpose(2, 0, 3, 1, 4)
        return q, kv[0], kv[1]


class SepConv2d(nn.Module):
    """Depthwise 3x3 + ReLU + pointwise 1x1 (reference :344-371)."""

    cin: int
    cout: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        y = Conv(
            self.cin, (self.kernel, self.kernel),
            padding=((p, p), (p, p)), feature_group_count=self.cin,
            dtype=self.dtype, name="depthwise",
        )(x)
        y = nn.relu(y)
        return Conv(self.cout, (1, 1), dtype=self.dtype, name="pointwise")(y)


class ConvProjection(nn.Module):
    """SepConv2d-based qkv on the window token grid (reference :381-398)."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_kv=None):
        bn, n, c = x.shape
        s = int(np.sqrt(n))
        d = self.dim // self.heads
        kv_src = x if attn_kv is None else attn_kv
        xg = x.reshape(bn, s, s, c)
        kg = kv_src.reshape(bn, s, s, c)
        q = SepConv2d(c, self.dim, dtype=self.dtype, name="to_q")(xg)
        k = SepConv2d(c, self.dim, dtype=self.dtype, name="to_k")(kg)
        v = SepConv2d(c, self.dim, dtype=self.dtype, name="to_v")(kg)

        def split(t):
            return t.reshape(bn, n, self.heads, d).transpose(0, 2, 1, 3)

        return split(q), split(k), split(v)


class WindowAttention(nn.Module):
    dim: int
    win_size: int
    num_heads: int
    token_projection: str = "linear"
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_kv=None, mask: Optional[jnp.ndarray] = None):
        # window tokens are shard-local by construction (the LeWin block
        # handles the cross-shard shift/mask, see LeWinTransformerBlock);
        # the projections below must therefore run WITHOUT the spatial
        # trace context — ConvProjection's window-grid convs would
        # otherwise try to halo-exchange window rows
        from promptir_tpu.parallel.spatial import spatial_sharding

        with spatial_sharding(None):
            return self._attend(x, attn_kv, mask)

    def _attend(self, x, attn_kv, mask):
        bn, n, c = x.shape
        d = self.dim // self.num_heads
        scale = d ** -0.5
        win = self.win_size

        table = self.param(
            "relative_position_bias_table",
            lambda key, shape: (
                jax.random.truncated_normal(key, -2.0, 2.0, shape) * 0.02
            ),
            ((2 * win - 1) * (2 * win - 1), self.num_heads),
        )
        if self.token_projection == "conv":
            q, k, v = ConvProjection(
                self.dim, self.num_heads, dtype=self.dtype, name="qkv"
            )(x, attn_kv)
        else:
            q, k, v = LinearProjection(
                self.dim, self.num_heads, self.qkv_bias, self.dtype,
                name="qkv",
            )(x, attn_kv)

        q = q * jnp.asarray(scale, q.dtype)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        )

        idx = jnp.asarray(relative_position_index(win).reshape(-1))
        bias = table[idx].reshape(win * win, win * win, self.num_heads)
        bias = bias.transpose(2, 0, 1)  # (nH, N, N)
        attn = attn + bias[None].astype(jnp.float32)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(
                bn // nw, nw, self.num_heads, n, attn.shape[-1]
            ) + mask[None, :, None].astype(jnp.float32)
            attn = attn.reshape(bn, self.num_heads, n, attn.shape[-1])
        attn = jax.nn.softmax(attn, axis=-1)

        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = out.transpose(0, 2, 1, 3).reshape(bn, n, self.dim)
        return Dense(
            self.dim, use_bias=True, dtype=self.dtype, name="proj"
        )(out.astype(x.dtype))


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        y = jax.nn.gelu(y, approximate=False)
        return Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class LeFF(nn.Module):
    """Linear+GELU -> depthwise 3x3 on the token grid +GELU -> Linear."""

    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = Dense(self.hidden, dtype=self.dtype, name="linear1_0")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = Conv(
            self.hidden, (3, 3), padding=((1, 1), (1, 1)),
            feature_group_count=self.hidden, dtype=self.dtype,
            name="dwconv_0",
        )(y)
        y = jax.nn.gelu(y, approximate=False)
        return Dense(self.dim, dtype=self.dtype, name="linear2_0")(y)


class LeWinTransformerBlock(nn.Module):
    """Swin-style block on NHWC features (reference :846-1008)."""

    dim: int
    num_heads: int
    win_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    token_projection: str = "linear"
    token_mlp: str = "leff"
    modulator: bool = False
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        from promptir_tpu.parallel.spatial import (
            current_spatial_axis,
            gather_rows,
            sharded_roll_h,
            slice_local_rows,
            spatial_sharding,
        )

        b, h, w, c = x.shape
        win = self.win_size
        shift = self.shift_size

        axis = current_spatial_axis()
        n_shards = 1 if axis is None else jax.lax.axis_size(axis)
        if axis is not None and n_shards > 1 and h % win:
            # the local stripe cannot hold whole windows (deep U-Net
            # levels): gather the (tiny) level, run the unsharded block
            # exactly, keep this shard's rows. LeFF's dwconv halo etc.
            # are global in the gathered frame, so the spatial context is
            # suspended for the inner call.
            xg = gather_rows(x, axis)
            with spatial_sharding(None):
                yg = self._body(xg, deterministic, None, 1)
            return slice_local_rows(yg, axis)
        return self._body(x, deterministic, axis, n_shards)

    def _body(self, x, deterministic, axis, n_shards):
        from promptir_tpu.parallel.spatial import sharded_roll_h

        b, h, w, c = x.shape
        win = self.win_size
        shift = self.shift_size

        shortcut = x
        y = TorchLayerNorm(self.dim, name="norm1")(x)
        if shift > 0:
            hg = h * n_shards
            if axis is not None and n_shards > 1:
                # torch.roll's cyclic H shift across shards: one
                # shift-row slab over the ICI ring (exact incl. the
                # global wrap); the W roll stays local. The Swin boundary
                # mask is position-dependent, so each shard takes its
                # window-row slice of the GLOBAL mask table.
                y = sharded_roll_h(y, -shift, axis)
                y = jnp.roll(y, -shift, axis=2)
                m_global = jnp.asarray(shift_attn_mask(hg, w, win, shift))
                m_rows = m_global.reshape(
                    hg // win, w // win, win * win, win * win
                )
                mask = jax.lax.dynamic_slice_in_dim(
                    m_rows, jax.lax.axis_index(axis) * (h // win),
                    h // win, axis=0,
                ).reshape(-1, win * win, win * win)
            else:
                y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
                mask = jnp.asarray(shift_attn_mask(h, w, win, shift))
        else:
            mask = None
        yw = window_partition(y, win)  # (B*nW, win^2, C)

        if self.modulator:
            mod = self.param(
                "modulator",
                nn.initializers.normal(stddev=1.0),
                (win * win, self.dim),
            )
            yw = yw + mod.astype(yw.dtype)

        yw = WindowAttention(
            self.dim, win, self.num_heads, self.token_projection,
            dtype=self.dtype, name="attn",
        )(yw, mask=mask)

        y = window_reverse(yw, win, h, w)
        if shift > 0:
            if axis is not None and n_shards > 1:
                y = sharded_roll_h(y, shift, axis)
                y = jnp.roll(y, shift, axis=2)
            else:
                y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))

        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(y, deterministic)

        z = TorchLayerNorm(self.dim, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        if self.token_mlp in ("ffn", "mlp"):
            z = Mlp(self.dim, hidden, dtype=self.dtype, name="mlp")(z)
        else:
            z = LeFF(self.dim, hidden, dtype=self.dtype, name="mlp")(z)
        return x + dp(z, deterministic)


class InputProj(nn.Module):
    """3x3 conv + LeakyReLU input projection (reference :776-800)."""

    out_channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv(
            self.out_channel, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="proj_0",
        )(x)
        return nn.leaky_relu(y, negative_slope=0.01)


class OutputProj(nn.Module):
    """3x3 conv token->image projection (reference :803-836)."""

    out_channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv(
            self.out_channel, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="proj_0",
        )(x)


class UformerDownsample(nn.Module):
    """4x4 stride-2 conv, pad 1 (reference :730-750)."""

    out_channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv(
            self.out_channel, (4, 4), strides=(2, 2),
            padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_0",
        )(x)


class UformerUpsample(nn.Module):
    """2x2 stride-2 transposed conv (reference :753-771).

    With kernel==stride there is no overlap, so this is exactly
    `out[2i+a, 2j+b] = sum_cin x[i,j,cin] * W[cin, a, b, cout] + bias`:
    an einsum + pixel-shuffle reshape (torch ConvTranspose2d weight
    (in, out, kh, kw) maps to (in, kh, kw, out))."""

    out_channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param(
            "deconv_kernel",
            nn.initializers.lecun_normal(),
            (cin, 2, 2, self.out_channel),
        )
        bias = self.param(
            "deconv_bias", nn.initializers.zeros, (self.out_channel,)
        )
        y = jnp.einsum(
            "nhwc,cpqo->nhpwqo", x.astype(jnp.float32),
            kernel.astype(jnp.float32),
        )
        y = y.reshape(b, 2 * h, 2 * w, self.out_channel) + bias
        return y.astype(x.dtype)
