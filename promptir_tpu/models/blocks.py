"""Shared Restormer-family building blocks.

Parity targets: TransformerBlock (/root/reference/net/model.py:183-196) and
the checkpoint-resident-but-unused ("dead") 1x1 convs of PromptIR
(/root/reference/net/model.py:271-287) which must exist in the param tree
for 1:1 checkpoint mapping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.ops.attention import MDTA
from promptir_tpu.ops.gdfn import GDFN
from promptir_tpu.ops.norm import RestormerLayerNorm
from promptir_tpu.utils.init import torch_kernel_init


class _LNParams(nn.Module):
    """Declares LayerNorm params (paths identical to RestormerLayerNorm)."""

    dim: int
    bias_free: bool

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = None
        if not self.bias_free:
            b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return w, b


class _ConvKernel(nn.Module):
    """Declares a conv kernel param (path identical to a bias-less Conv)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_kernel_init, self.shape)


class _GDFNParams(nn.Module):
    """GDFN weights with the same param paths as the GDFN module."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1 = _ConvKernel((1, 1, self.dim, 2 * self.hidden), name="project_in")()
        wdw = _ConvKernel((3, 3, 1, 2 * self.hidden), name="dwconv")()
        w2 = _ConvKernel((1, 1, self.hidden, self.dim), name="project_out")()
        return w1, wdw, w2


class _AttnParams(nn.Module):
    """MDTA weights with the same param paths as the MDTA module."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self):
        wqkv = _ConvKernel((1, 1, self.dim, 3 * self.dim), name="qkv")()
        wdw = _ConvKernel((3, 3, 1, 3 * self.dim), name="qkv_dwconv")()
        wproj = _ConvKernel((1, 1, self.dim, self.dim), name="project_out")()
        temp = self.param("temperature", nn.initializers.ones, (self.heads,))
        return wqkv, wdw, wproj, temp


def fused_mdta_gdfn_block(x, dim, num_heads, hidden, *, bias_free, dtype,
                          names=("norm1", "attn", "norm2", "ffn"),
                          padded_shape=None, remat_fallback=False):
    """Declare an MDTA+GDFN block's params (paths identical to the unfused
    modules) and run it through the fused kernels. Shared by
    TransformerBlock, XTransformerBlock's channel half, and
    ChannelTransformerBlock — only the submodule names differ.

    `padded_shape=(W, C)` marks x as already in the kernels' padded layout
    (see ops/pallas/block.py:pad_nhwc) — chain mode, in and out padded."""
    lnw1, lnb1 = _LNParams(dim, bias_free, name=names[0])()
    wqkv, wdw, wproj, temp = _AttnParams(dim, num_heads, name=names[1])()
    lnw2, lnb2 = _LNParams(dim, bias_free, name=names[2])()
    w1, wdwf, w2 = _GDFNParams(dim, hidden, name=names[3])()
    return fused_block_apply(
        x, lnw1, lnb1, wqkv, wdw, wproj, temp, num_heads,
        lnw2, lnb2, w1, wdwf, w2, bias_free=bias_free, dtype=dtype,
        padded_shape=padded_shape, remat_fallback=remat_fallback,
    )


def fused_block_apply(x, lnw1, lnb1, wqkv, wdwa, wproj, temp, num_heads,
                      lnw2, lnb2, w1, wdwf, w2, *, bias_free, dtype,
                      padded_shape=None, remat_fallback=False):
    """x + MDTA(LN1(x)); + GDFN(LN2(.)) through the Pallas kernels.

    Tries whole-block fusion (stats + tail, ops/pallas/block.py), then the
    per-branch fused kernels, then plain XLA — identical math and params
    either way; everything differentiable (custom-VJP wrappers).

    `padded_shape=(W, C)` runs in padded-layout chain mode: x is
    (B,H,wp,cp) from pad_nhwc and comes back padded too. The caller is
    responsible for only requesting it when the fused path fits
    (autodiff.block_fits) — otherwise the block unpads, computes, repads.

    `remat_fallback=True` wraps the plain-XLA fallbacks in
    `jax.checkpoint`. The fused kernels themselves never need it: their
    custom VJP saves only the block input + weights and recomputes the
    rest in the backward (ops/pallas/autodiff.py), i.e. each fused block
    IS its own remat boundary — wrapping one in nn.remat replays the
    fused forward a second time for nothing (measured 925 vs 528 ms/step,
    TRAIN_BENCH.md round 3).
    """
    from promptir_tpu.ops.pallas.autodiff import (
        ln_block,
        ln_block_p,
        ln_gdfn,
        ln_mdta,
        xla_ln_gdfn,
        xla_ln_mdta,
    )

    if padded_shape is not None:
        from promptir_tpu.ops.pallas.block import pad_nhwc, unpad_nhwc

        w_real, c_real = padded_shape
        dim = c_real
        hidden = w2.shape[0] if w2.ndim == 2 else w2.shape[2]
        out = ln_block_p(
            x.astype(dtype), w_real, c_real, lnw1, lnb1,
            wqkv.reshape(dim, 3 * dim), wdwa.reshape(3, 3, 3 * dim),
            wproj.reshape(dim, dim), temp, num_heads, lnw2, lnb2,
            w1.reshape(dim, 2 * hidden), wdwf.reshape(3, 3, 2 * hidden),
            w2.reshape(hidden, dim), bias_free=bias_free,
        )
        if out is not None:
            return out.astype(x.dtype)
        # fallback (callers normally pre-check): unpad, compute, repad
        inner = fused_block_apply(
            unpad_nhwc(x, w_real, c_real), lnw1, lnb1, wqkv, wdwa, wproj,
            temp, num_heads, lnw2, lnb2, w1, wdwf, w2,
            bias_free=bias_free, dtype=dtype,
            remat_fallback=remat_fallback,
        )
        return pad_nhwc(inner)

    dim = x.shape[-1]
    hidden = w2.shape[0] if w2.ndim == 2 else w2.shape[2]
    margs = (
        x.astype(dtype),
        lnw1,
        lnb1,
        wqkv.reshape(dim, 3 * dim),
        wdwa.reshape(3, 3, 3 * dim),
        wproj.reshape(dim, dim),
        temp,
        num_heads,
    )
    gargs = (
        lnw2,
        lnb2,
        w1.reshape(dim, 2 * hidden),
        wdwf.reshape(3, 3, 2 * hidden),
        w2.reshape(hidden, dim),
    )
    out = ln_block(*margs[:7], num_heads, *gargs, bias_free=bias_free)
    if out is not None:
        return out.astype(x.dtype)
    _ckpt = jax.checkpoint if remat_fallback else (lambda f: f)
    out = ln_mdta(*margs, bias_free=bias_free)
    if out is None:
        out = _ckpt(
            lambda *a: xla_ln_mdta(*a, num_heads, bias_free=bias_free)
        )(*margs[:7])
    x2 = out
    out = ln_gdfn(x2, *gargs, bias_free=bias_free)
    if out is None:
        out = _ckpt(lambda *a: xla_ln_gdfn(*a, bias_free=bias_free))(
            x2, *gargs
        )
    return out.astype(x.dtype)


def fused_gdfn_apply(x, lnw, lnb, w1, wdw, w2, *, bias_free, dtype):
    """x + GDFN(LN(x)) through the fused kernel, with XLA fallback."""
    from promptir_tpu.ops.pallas.autodiff import ln_gdfn, xla_ln_gdfn

    dim = x.shape[-1]
    hidden = w2.shape[0] if w2.ndim == 2 else w2.shape[2]
    gargs = (
        x.astype(dtype),
        lnw,
        lnb,
        w1.reshape(dim, 2 * hidden),
        wdw.reshape(3, 3, 2 * hidden),
        w2.reshape(hidden, dim),
    )
    out = ln_gdfn(*gargs, bias_free=bias_free)
    if out is None:
        out = xla_ln_gdfn(*gargs, bias_free=bias_free)
    return out.astype(x.dtype)


class TransformerBlock(nn.Module):
    """x += MDTA(LN(x)); x += GDFN(LN(x)).

    `fused_ffn=True` runs the whole block through Pallas TPU kernels (same
    params/paths; bias-less configs only): an MDTA stats pass, then one
    fused attention-apply + LN + GDFN tail — a large HBM-bandwidth win on
    full-resolution levels. Differentiable via the custom-VJP wrappers in
    ops/pallas/autodiff.py (backward = remat through the unfused math).
    """

    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_norm: bool = False  # reference 'LayerNorm_type' WithBias default
    dtype: jnp.dtype = jnp.float32
    fused_ffn: bool = False
    # jax.checkpoint the plain-XLA fallback paths (the fused kernels are
    # their own remat boundary via custom_vjp — see fused_block_apply)
    remat_fallback: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, padded_shape=None) -> jnp.ndarray:
        hidden = int(self.dim * self.expansion)
        if self.fused_ffn and not self.use_bias:
            return fused_mdta_gdfn_block(
                x, self.dim, self.num_heads, hidden,
                bias_free=self.bias_free_norm, dtype=self.dtype,
                padded_shape=padded_shape,
                remat_fallback=self.remat_fallback,
            )
        assert padded_shape is None  # chain mode requires the fused path
        y = RestormerLayerNorm(
            self.dim, self.bias_free_norm, name="norm1"
        )(x)
        x = x + MDTA(
            self.dim, self.num_heads, self.use_bias, self.dtype,
            name="attn",
        )(y)
        y = RestormerLayerNorm(self.dim, self.bias_free_norm, name="norm2")(x)
        x = x + GDFN(
            self.dim, self.expansion, self.use_bias, self.dtype, name="ffn"
        )(y)
        return x


def apply_block_stack(blocks, x, *, fused: bool, expansion: float = 2.66,
                      in_padded=None, out_padded: bool = False):
    """Run a uniform sequence of TransformerBlocks.

    When the whole-block fused path applies, the blocks are chained in the
    kernels' padded layout: ONE pad before the stack and ONE slice after it
    instead of per-block XLA pad/slice copies (~1.7 ms each at the
    full-resolution level of a batch-8 512px forward). Falls back to the
    plain per-block loop whenever the fused path wouldn't run.

    `in_padded=(w, c)` declares x already in the pad_nhwc layout (zero
    borders) — the entry pad is skipped, or the layout unpadded on
    fallback. With `out_padded=True` the return is `(y, padded)` where
    `padded` is `(w, c)` if y was left in the padded layout (the caller
    owns the exit slice — e.g. hands it to a padded-input conv head) and
    None if y is plain NHWC."""
    from promptir_tpu.ops.pallas.block import pad_nhwc, unpad_nhwc

    def _ret(y, padded):
        return (y, padded) if out_padded else y

    if not blocks:
        if in_padded is not None and not out_padded:
            # the caller expects plain NHWC back (same contract as the
            # non-fused fallback below)
            return unpad_nhwc(x, *in_padded)
        return _ret(x, in_padded)
    blk = blocks[0]
    fused = fused and len(blocks) > 1 and blk.fused_ffn and not blk.use_bias
    if fused:
        from promptir_tpu.ops.pallas.autodiff import block_fits

        if in_padded is not None:
            _, h, _, _ = x.shape
            w, c = in_padded
        else:
            _, h, w, c = x.shape
        two_f = 2 * int(c * expansion)
        if block_fits(h, w, c, two_f, blk.num_heads):
            xp = x if in_padded is not None else pad_nhwc(x)
            for b in blocks:
                xp = b(xp, padded_shape=(w, c))
            if out_padded:
                return xp, (w, c)
            return unpad_nhwc(xp, w, c)
    if in_padded is not None:
        x = unpad_nhwc(x, *in_padded)
    for b in blocks:
        x = b(x)
    return _ret(x, None)


class DeadConv(nn.Module):
    """Declares a 1x1 conv's params without computing anything.

    The reference PromptIR instantiates several convs it never calls in
    forward (net/model.py:271-287); released checkpoints contain their
    weights, so the param tree must too. XLA dead-code-eliminates these.
    """

    cin: int
    cout: int
    use_bias: bool = False

    @nn.compact
    def __call__(self) -> None:
        self.param("kernel", torch_kernel_init, (1, 1, self.cin, self.cout))
        if self.use_bias:
            self.param("bias", nn.initializers.zeros, (self.cout,))
        return None
