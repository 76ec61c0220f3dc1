"""Pixel-(un)shuffle resampling in NHWC.

Behavioral parity targets: reference `Downsample`/`Upsample`
(/root/reference/net/model.py:160-178) which are 3x3 conv + torch
PixelUnshuffle(2)/PixelShuffle(2) in NCHW. Here the shuffles are pure
reshape/transpose in NHWC (free for XLA to fuse into the neighbouring
convs); the channel ordering matches torch's `c*r*r + i*r + j` convention
so converted checkpoints line up exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.ops.conv import Conv, Dense
from promptir_tpu.utils.init import torch_kernel_init


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


def fold_unshuffle_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,C,F) pad-1 conv kernel -> the (4,4,C,4F) stride-2 kernel whose
    conv equals conv3x3(pad 1) followed by pixel_unshuffle(2).

    out[i', j', f*4 + di*2 + dj] = conv3x3(x)[2i'+di, 2j'+dj, f], and the
    strided window at (i', j') covers x rows 2i'-1..2i'+2, so tap (ky, kx)
    of the original kernel lands at (ky+di, kx+dj) of the 4x4 kernel.
    """
    c, f = w.shape[2], w.shape[3]
    k = jnp.zeros((4, 4, c, f, 2, 2), w.dtype)
    for di in range(2):
        for dj in range(2):
            k = k.at[di : di + 3, dj : dj + 3, :, :, di, dj].set(w)
    return k.reshape(4, 4, c, f * 4)


def conv3x3_few_channels(x: jnp.ndarray, w: jnp.ndarray, dtype) -> jnp.ndarray:
    """Stride-1 pad-1 3x3 conv computed as a 4x4 stride-2 conv to 4x the
    output channels + pixel_shuffle.

    For tiny C_out (PromptIR's 3-channel output conv), the direct conv
    wastes nearly all MXU output lanes (3 of 128); folding the 2x2 output
    phases into channels quarters the spatial extent and packs 4*C_out
    lanes — identical math, ~2x fewer effective (lane-padded) MACs.
    """
    k = fold_unshuffle_kernel(w).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k,
        window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return pixel_shuffle(y, 2)


class _Kernel(nn.Module):
    """Declares a conv kernel param (path identical to a bias-less Conv)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_kernel_init, self.shape)


class FewChannelConv3(nn.Module):
    """3x3 pad-1 conv head with tiny C_out (the models' RGB output conv).
    Param paths/init identical to `Conv(features, (3, 3))`.

    The folded stride-2 form (conv3x3_few_channels) was profiled for this
    head and measured SLOWER than the direct conv on v5e (3.6 vs 3.2 ms at
    8x512^2x96->3: XLA's strided-conv emitter loses more than the 2x
    lane-padding saving), so this runs the direct form — kept as a module
    so the head stays a single swap point if that tradeoff changes.
    """

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, padded_shape=None) -> jnp.ndarray:
        from promptir_tpu.parallel.spatial import (
            current_spatial_axis,
            exchange_rows,
        )

        axis = current_spatial_axis()
        if padded_shape is not None:
            # x is in the fused kernels' pad_nhwc layout (B,H,wp,cp) with
            # ZERO borders: the left zero column and the zero tail double
            # as the conv's width padding, and zero-padded input-channel
            # lanes keep the pad lanes inert — the full-width exit slice
            # the head otherwise forces (~3.3 ms at 512^2x128 lanes)
            # never happens; only the tiny features-channel output is
            # cropped.
            assert axis is None, "padded head is single-chip only"
            w_real, c_real = padded_shape
            w = self.param(
                "kernel", torch_kernel_init, (3, 3, c_real, self.features)
            )
            wk = jnp.pad(w, ((0, 0), (0, 0), (0, x.shape[-1] - c_real),
                             (0, 0)))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), wk.astype(self.dtype),
                window_strides=(1, 1), padding=((1, 1), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[:, :, :w_real, :]
            if self.use_bias:
                b = self.param(
                    "bias", nn.initializers.zeros, (self.features,)
                )
                y = y + b.astype(y.dtype)
            return y

        cin = x.shape[-1]
        w = self.param(
            "kernel", torch_kernel_init, (3, 3, cin, self.features)
        )
        h_pad = (1, 1)
        if axis is not None:  # sharded: neighbor rows replace zero pad
            x = exchange_rows(x, 1, axis)
            h_pad = (0, 0)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1, 1), padding=(h_pad, (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            y = y + b.astype(y.dtype)
        return y


class SRUpsample(nn.Module):
    """Super-resolution upsampler for 2^n and 3x scales.

    Parity: reference `SR_Upsample`
    (/root/reference/net/camixer_prompt_xrestormer_eff.py:561-580, with
    identical clones in 3 other net files) — a torch Sequential of
    [3x3 conv C -> r^2*C, PixelShuffle(r)] stages: log2(scale) stages of
    r=2 for power-of-two scales, one r=3 stage for scale 3. Note it is
    dead code in the reference (defined but never instantiated); it exists
    here for inventory completeness. Module names are the torch Sequential
    indices ("0", "2", ...) so a state_dict maps 1:1 through the
    converter. Torch Conv2d default bias=True.
    """

    scale: int
    num_feat: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda cout, name: Conv(  # noqa: E731
            cout,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name=name,
        )
        if self.scale > 0 and (self.scale & (self.scale - 1)) == 0:
            for i in range(self.scale.bit_length() - 1):
                x = conv(4 * self.num_feat, str(2 * i))(x)
                x = pixel_shuffle(x, 2)
            return x
        if self.scale == 3:
            x = conv(9 * self.num_feat, "0")(x)
            return pixel_shuffle(x, 3)
        raise ValueError(
            f"scale {self.scale} is not supported. Supported scales: 2^n and 3."
        )


class Downsample(nn.Module):
    """3x3 conv C -> C/2 then 2x pixel-unshuffle (net: 2C channels at H/2).

    Parity: reference Downsample (/root/reference/net/model.py:160-169).
    On TPU the C/2-channel intermediate wastes most MXU output lanes (24 of
    128 at the full-resolution level) and the unshuffle is a transpose
    round-trip, so when profitable the two ops run as ONE 4x4 stride-2 conv
    producing the 2C channels directly — the kernel is rearranged from the
    same (3,3,C,C/2) parameter (fold_unshuffle_kernel), mathematically
    identical and checkpoint-compatible.
    """

    n_feat: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, padded_shape=None,
                 padded_out: bool = False) -> jnp.ndarray:
        from promptir_tpu.parallel.spatial import current_spatial_axis

        half = self.n_feat // 2
        lanes = lambda n: -(-n // 128) * 128  # noqa: E731
        if padded_shape is not None:
            # x is in the fused kernels' pad_nhwc layout (B,H,wp,cp): one
            # zero column left, zero columns right, zero-padded lanes. The
            # folded stride-2 conv consumes it DIRECTLY: the zero borders
            # double as the conv's width padding (window for output j'
            # covers padded cols 2j'..2j'+3 = logical 2j'-1..2j'+2) and
            # zero input lanes meet zero kernel rows — the full-width exit
            # slice (~3.3 ms at 512^2 x 128 lanes) is replaced by a crop
            # of the 4x-smaller output.
            assert current_spatial_axis() is None
            w_real, c_real = padded_shape
            w = _Kernel((3, 3, c_real, half), name="body_0")()
            k = fold_unshuffle_kernel(w)
            k = jnp.pad(k, ((0, 0), (0, 0), (0, x.shape[-1] - c_real),
                            (0, 0))).astype(self.dtype)
            if padded_out:
                # emit the NEXT level's pad_nhwc layout directly: shift
                # the window left by one output column (width pad 2) so
                # real outputs land at cols 1..w/2, and size the right pad
                # to hit wp2 exactly. Col 0 and the first tail col come
                # out dirty (their windows touch real pixels) — chain
                # entries tolerate dirty border columns (the kernels mask
                # the stripe before any spatial tap; see
                # ops/embed.py:OverlapPatchEmbed padded_out). Kernel
                # output channels are zero-widened to cp2 so pad lanes
                # stay true zero (load-bearing for the entry LN).
                w2 = w_real // 2
                wp2 = w2 + 2 + ((-(w2 + 2)) % 8)
                cp2 = lanes(4 * half)
                pr = 2 * wp2 - x.shape[2]
                assert pr >= 0, "padded_out needs 2*wp2 >= wp_in"
                k = jnp.pad(k, ((0, 0), (0, 0), (0, 0),
                                (0, cp2 - 4 * half)))
                return jax.lax.conv_general_dilated(
                    x.astype(self.dtype), k,
                    window_strides=(2, 2), padding=((1, 1), (2, pr)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), k,
                window_strides=(2, 2), padding=((1, 1), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y[:, :, : w_real // 2, :]
        # effective MXU cost per logical MAC: taps * lane-padding waste.
        # Under a spatial-sharding trace the direct path is used: its 3x3
        # conv gets the halo exchange from the Conv hook and the
        # pixel-unshuffle stays local (stripe heights are even).
        if current_spatial_axis() is None and (
            16 * lanes(4 * half) / (4 * half) < 9 * lanes(half) / half
        ):
            w = _Kernel((3, 3, self.n_feat, half), name="body_0")()
            k = fold_unshuffle_kernel(w).astype(self.dtype)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), k,
                window_strides=(2, 2), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        x = Conv(
            half,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="body_0",
        )(x)
        return pixel_unshuffle(x, 2)


class Upsample(nn.Module):
    """3x3 conv C -> 2C then 2x pixel-shuffle (net: C/2 channels at 2H).

    The torch-order shuffle transposes (b,h,w,c,i,j)->(b,h,i,w,j,c), moving
    the channel dim from minor to major — XLA emits it as a scattered-lane
    copy (3.1 ms at 16x256^2x192 -> 512^2x48, trace op copy.457). When
    enabled, the ij-major form permutes the conv KERNEL's output channels
    to (i, j, c) order instead, so the shuffle's transpose only swaps w<->i
    while the minor (j, c) block stays contiguous — identical math and
    checkpoint layout (the permutation is applied to the weight at trace
    time, a (3,3,C,2C) gather XLA folds away)."""

    n_feat: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, fold=None,
                 emit_ij_padded: bool = False) -> jnp.ndarray:
        """`fold`: optional (n_feat//2, cout) matrix of a 1x1 conv that
        immediately follows the upsample (a decoder `reduce_chan_*` split
        at the concat boundary). Because pixel-shuffle only permutes
        (position, channel), the 1x1 composes into the up-conv KERNEL at
        trace time — same conv cost, and the reduce's separate pass over
        the full-resolution tensor never runs (decoder-seam fusion,
        PROFILE.md round-4 plan).

        `emit_ij_padded`: return the RAW conv output (B, H, W, cp) with
        ij-major lanes zero-widened to a 128 multiple, skipping the
        shuffle entirely — the caller hands it to the Pallas seam kernel
        (ops/pallas/seam.py) which performs the interleave during the
        chain-entry write. Caller must ensure the ij branch applies
        (single-chip, f % 4 == 0, PROMPTIR_SHUFFLE_IJ != 0)."""
        import os

        f = self.n_feat * 2
        if (
            os.environ.get("PROMPTIR_SHUFFLE_IJ", "1") != "0"
            and f % 4 == 0
        ):
            from promptir_tpu.parallel.spatial import current_spatial_axis

            if current_spatial_axis() is None:
                w = _Kernel((3, 3, x.shape[-1], f), name="body_0")()
                c = f // 4
                if fold is not None:
                    # torch lane order c*4 + i*2 + j -> dims (c, i, j);
                    # compose the 1x1 and emit ij-major (i, j, cout) lanes
                    cin = x.shape[-1]
                    cout = fold.shape[1]
                    w_ij = jnp.einsum(
                        "xyzcij,cd->xyzijd",
                        w.reshape(3, 3, cin, c, 2, 2),
                        fold,
                    ).reshape(3, 3, cin, 4 * cout)
                    c = cout
                else:
                    # torch lane order is c*4 + i*2 + j; ij-major wants
                    # (i*2 + j)*c + c_idx
                    idx = jnp.arange(f)
                    perm = (idx % 4) * c + idx // 4  # dest of lane idx
                    w_ij = jnp.zeros_like(w).at[..., perm].set(w)
                if emit_ij_padded:
                    cp_in = -(-4 * c // 128) * 128
                    w_ij = jnp.pad(
                        w_ij, ((0, 0), (0, 0), (0, 0), (0, cp_in - 4 * c))
                    )
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), w_ij.astype(self.dtype),
                    window_strides=(1, 1), padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                if emit_ij_padded:
                    return y
                b, h, wdt, _ = y.shape
                y = y.reshape(b, h, wdt, 2, 2, c)
                y = y.transpose(0, 1, 3, 2, 4, 5)  # (b,h,i,w,j,c)
                return y.reshape(b, 2 * h, 2 * wdt, c)
        assert not emit_ij_padded, "emit_ij_padded needs the ij branch"
        x = Conv(
            f,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="body_0",
        )(x)
        y = pixel_shuffle(x, 2)
        if fold is not None:
            y = jnp.einsum("bhwc,cd->bhwd", y, fold.astype(y.dtype))
        return y
