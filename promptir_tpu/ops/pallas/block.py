"""Whole-TransformerBlock fusion: MDTA apply + LN + GDFN in one kernel.

A TransformerBlock (/root/reference/net/model.py:183-196) is
  x2 = x + MDTA(LN1(x));  out = x2 + GDFN(LN2(x2)).
With the two-kernel MDTA (ops/pallas/mdta.py) plus the GDFN kernel
(ops/pallas/gdfn.py), x2 makes a full HBM round-trip between the MDTA
apply pass and the FFN pass. This module fuses those two into one "tail"
kernel: it streams v (from the MDTA stats pass) and x in row stripes,
applies the attention matrix + out-projection + residual in registers,
and feeds x2 straight into the LN+GDFN body. Per block that removes two
full-resolution HBM transfers and one kernel launch's per-program
overhead; x2 also stays fp32 into LN2 instead of being rounded to the
storage dtype in between.

`fused_transformer_block` assembles the full block: mdta_stats (kernel A
+ the tiny softmax) then the tail. Differentiability comes from
`ops/pallas/autodiff.py` (custom-VJP over the whole block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from promptir_tpu.ops.pallas import gdfn as _gdfn_mod
from promptir_tpu.ops.pallas.gdfn import _lanes, _pad_last
from promptir_tpu.ops.pallas import mdta as _mdta


def _pick_th_tail(h, w, cp, two_f, vmem_budget=None):
    """Largest stripe height for the tail kernel's working set.

    Keep the default 44 MB budget: raising it to 64 MB (th=8 -> 16 at
    8x512^2x96) re-measured SLOWER (31.5 vs 28.8 ms whole-block) — the
    bigger working set starves the auto-pipeline's double buffering."""
    if w % 8:
        # the v-buffer halo DMAs slice (1, w, cp) rows; Mosaic requires
        # 8-aligned sublane slices (fails at the 28px latent of a 224px
        # input) — see gdfn._pick_th
        return None
    vmem_budget = _gdfn_mod.VMEM_BUDGET if vmem_budget is None else vmem_budget
    s = _gdfn_mod._mxu_pairs(_lanes(two_f // 2))
    two_fv = 2 * (_lanes(two_f // 2) - s)
    wp = w + 2 + ((-(w + 2)) % 8)
    for th in (32, 16, 8, 4, 2):
        if h % th:
            continue
        x_blocks = (th + 2) * wp * cp * 2 * 2      # x stripe (dbl-buffered)
        v_blocks = (th + 2) * w * cp * 2 * 2       # v stripe
        x2 = (th + 2) * wp * cp * 4                # fp32 x2
        hidden = (th + 2) * wp * two_fv * 4 if two_fv else 0
        acc = th * w * two_fv * 4 if two_fv else 0
        out = th * w * cp * 4 * 2
        total = x_blocks + v_blocks + x2 + hidden + acc + out
        if s:
            total += th * w * 9 * cp * 2   # im2col (io dtype)
            total += th * w * 2 * s * 4    # fp32 m-accumulator
        if _gdfn_mod.MICROTILE:
            total += hidden + acc // 2  # persistent A/B-path scratch
        if total < vmem_budget:
            return th
    return None


def pad_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> the kernels' padded layout (B,H,wp,cp): one zero column
    left, zero columns right up to wp = 8-aligned W+2, zero lanes to cp."""
    _, _, w, c = x.shape
    w_extra = (-(w + 2)) % 8
    return jnp.pad(x, ((0, 0), (0, 0), (1, 1 + w_extra), (0, _lanes(c) - c)))


def unpad_nhwc(xp: jnp.ndarray, w: int, c: int) -> jnp.ndarray:
    """Inverse of pad_nhwc given the real (W, C)."""
    return xp[:, :, 1 : 1 + w, :c]


def _tail_kernel(vb_ref, xb_ref, v_hbm, x_hbm, attn_ref, wproj_ref,
                 lnw_ref, lnb_ref, w1_ref, wdw_ref, w2_ref, *rest, th, w,
                 wp, c_real, bias_free, eps, pad_out=False, s=0):
    if s:
        w1m_ref, *rest = rest
    else:
        w1m_ref = None
    out_ref, vhalo_ref, xhalo_ref, sem, *extra = rest
    if s:
        yim_ref = extra[-1]
        mt_refs = extra[:-1]
    else:
        yim_ref = None
        mt_refs = extra
    cp = xb_ref.shape[-1]
    i = pl.program_id(1)
    bi = pl.program_id(0)
    h_total = th * pl.num_programs(1)

    xtop, xbot = _gdfn_mod.fetch_row_halos(x_hbm, xhalo_ref, sem.at[0],
                                           bi, i, th, h_total)
    vtop, vbot = _gdfn_mod.fetch_row_halos(v_hbm, vhalo_ref, sem.at[1],
                                           bi, i, th, h_total)

    xt = jnp.concatenate([xtop, xb_ref[0], xbot], axis=0)
    vt = jnp.concatenate([vtop, vb_ref[0], vbot], axis=0)

    # ---- MDTA apply (the old kernel B) on th+2 rows ----
    av = jax.lax.dot_general(
        vt.reshape(-1, cp), attn_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(vt.dtype)
    o = jax.lax.dot_general(
        av, wproj_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(th + 2, w, cp)
    # widen o to the padded stripe width (pad cols never reach the output:
    # the y mask below zeroes them before the expansion matmul and the
    # residual slice takes the interior only)
    o_wide = jnp.concatenate(
        [
            jnp.zeros((th + 2, 1, cp), jnp.float32),
            o,
            jnp.zeros((th + 2, wp - w - 1, cp), jnp.float32),
        ],
        axis=1,
    )
    x2 = xt.astype(jnp.float32) + o_wide  # (th+2, wp, cp) fp32

    # ---- LN2 + GDFN on x2: the body shared with gdfn._kernel ----
    ffn = _gdfn_mod.ln_gdfn_stripe(
        x2, i, lnw_ref, lnb_ref, w1_ref, wdw_ref, w2_ref, xt.dtype,
        th=th, w=w, wp=wp, c_real=c_real, bias_free=bias_free, eps=eps,
        mt_refs=mt_refs if mt_refs else None, w1m_ref=w1m_ref, s=s,
        yim_ref=yim_ref,
    )
    residual = x2[1 : th + 1, 1 : w + 1, :]
    res = (ffn + residual).astype(out_ref.dtype)
    if pad_out:
        # chain mode: write the padded layout back (zero borders preserved
        # for the next block's stats pass)
        cp = res.shape[-1]
        out_ref[0] = jnp.concatenate(
            [
                jnp.zeros((th, 1, cp), out_ref.dtype),
                res,
                jnp.zeros((th, wp - w - 1, cp), out_ref.dtype),
            ],
            axis=1,
        )
    else:
        out_ref[0] = res


def fused_block_tail(
    v: jnp.ndarray,
    x: jnp.ndarray,
    attn: jnp.ndarray,
    w_proj: jnp.ndarray,
    ln_w: jnp.ndarray,
    ln_b: jnp.ndarray | None,
    w1: jnp.ndarray,
    wdw: jnp.ndarray,
    w2: jnp.ndarray,
    *,
    bias_free: bool = False,
    eps: float = 1e-5,
    interpret: bool = False,
    prepadded: tuple | None = None,
    padded_out: bool = False,
):
    """(x + attn-apply(v)) + GDFN(LN(...)) in one pass.

    v: (B,H,W,cp) and attn: (B,cp,cp) from `mdta.mdta_stats`; x: (B,H,W,C).
    Returns (B,H,W,C) in x.dtype, or None if no stripe fits VMEM.

    `prepadded=(w, c)` declares x already in the padded layout (B,H,wp,cp)
    with zero pad columns/lanes; `padded_out=True` keeps the output in that
    layout too (chain mode — no per-block XLA pad/slice copies).
    """
    if prepadded is None:
        b, h, w, c = x.shape
        cp = _lanes(c)
        w_extra = (-(w + 2)) % 8
        wp = w + 2 + w_extra
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + w_extra), (0, cp - c)))
    else:
        w, c = prepadded
        b, h, wp, cp = x.shape
        assert cp == _lanes(c) and wp == w + 2 + ((-(w + 2)) % 8), (
            "prepadded x must be in pad_nhwc layout"
        )
        xp = x
    two_f = w1.shape[1]
    f = two_f // 2
    fpad = _lanes(f)
    th = _pick_th_tail(h, w, cp, two_f)
    if th is None:
        return None
    dtype = x.dtype
    if ln_b is None:
        ln_b = jnp.zeros_like(ln_w)

    lnw_p = _pad_last(ln_w, cp)
    lnb_p = _pad_last(ln_b, cp)
    s = _gdfn_mod._mxu_pairs(fpad)
    w1m_p, w1_p, wdw_p = _gdfn_mod._split_dw_weights(
        w1, wdw, c, f, cp, fpad, s
    )
    w2_p = jnp.pad(w2, ((0, fpad - f), (0, cp - c)))
    wproj_p = jnp.pad(w_proj, ((0, cp - c), (0, cp - c)))

    kern = functools.partial(
        _tail_kernel, th=th, w=w, wp=wp, c_real=c, bias_free=bias_free,
        eps=eps, pad_out=padded_out, s=s,
    )
    out_w = wp if padded_out else w
    grid = (b, h // th)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, th, w, cp), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, wp, cp), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # v, halo rows by DMA
            pl.BlockSpec(memory_space=pltpu.ANY),  # x, halo rows by DMA
            pl.BlockSpec(
                (1, cp, cp), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cp, cp), lambda *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((cp,), lambda *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp,), lambda *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (cp, w1_p.shape[-1]), lambda *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3, w1_p.shape[-1]), lambda *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (fpad, cp), lambda *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        + (
            [
                pl.BlockSpec(
                    (9 * cp, 2 * s), lambda *_: (0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            if s
            else []
        ),
        out_specs=pl.BlockSpec(
            (1, th, out_w, cp), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, out_w, cp), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, w, cp), dtype),
            pltpu.VMEM((2, 2, wp, cp), dtype),
            pltpu.SemaphoreType.DMA((2, 2, 2)),
        ]
        + (
            [
                pltpu.VMEM((th + 2, wp, 2 * fpad), jnp.float32),
                pltpu.VMEM((th, w, fpad), jnp.float32),
            ]
            if _gdfn_mod.MICROTILE and w % 8 == 0
            else []
        )
        + ([pltpu.VMEM((th, w, 9 * cp), dtype)] if s else []),
        compiler_params=pltpu.CompilerParams(
            # stripes sequential so the pipelined halo prefetch is sound
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_gdfn_mod.VMEM_LIMIT,
        ),
        interpret=interpret,
    )(v, xp, v, xp, attn, wproj_p.astype(dtype), lnw_p.astype(dtype),
      lnb_p.astype(dtype), w1_p.astype(dtype), wdw_p.astype(dtype),
      w2_p.astype(dtype), *([w1m_p.astype(dtype)] if s else []))
    if padded_out:
        return out
    return out[:, :, :, :c] if cp != c else out


def fused_transformer_block(
    x: jnp.ndarray,
    ln1_w, ln1_b, w_qkv, w_dw, w_proj, temperature, num_heads,
    ln2_w, ln2_b, w1, wdw, w2,
    *,
    bias_free: bool = False,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Full TransformerBlock as stats pass + fused tail.

    Returns (B,H,W,C) or None (caller falls back) when either pass has no
    VMEM-fitting stripe.
    """
    b, h, w, c = x.shape
    if _pick_th_tail(h, w, _lanes(c), w1.shape[1]) is None:
        return None
    stats = _mdta.mdta_stats(
        x, ln1_w, ln1_b, w_qkv, w_dw, temperature, num_heads,
        bias_free=bias_free, eps=eps, interpret=interpret,
    )
    if stats is None:
        return None
    v, attn = stats
    return fused_block_tail(
        v, x, attn, w_proj, ln2_w, ln2_b, w1, wdw, w2,
        bias_free=bias_free, eps=eps, interpret=interpret,
    )


def fused_transformer_block_padded(
    xp: jnp.ndarray,
    w: int,
    c: int,
    ln1_w, ln1_b, w_qkv, w_dw, w_proj, temperature, num_heads,
    ln2_w, ln2_b, w1, wdw, w2,
    *,
    bias_free: bool = False,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Full TransformerBlock in the padded layout: xp is (B,H,wp,cp) with
    zero pad columns/lanes (pad_nhwc); returns the same layout. Chaining N
    blocks this way pays ONE pad + ONE slice instead of one per block —
    at 8x512^2x96 the per-block XLA pad copy alone is ~1.7 ms against a
    ~25 ms block. Returns None (caller falls back) when no stripe fits.
    """
    _, h, _, cp = xp.shape
    if _pick_th_tail(h, w, cp, w1.shape[1]) is None:
        return None
    stats = _mdta.mdta_stats(
        xp, ln1_w, ln1_b, w_qkv, w_dw, temperature, num_heads,
        bias_free=bias_free, eps=eps, interpret=interpret,
        prepadded=(w, c),
    )
    if stats is None:
        return None
    v, attn = stats
    return fused_block_tail(
        v, xp, attn, w_proj, ln2_w, ln2_b, w1, wdw, w2,
        bias_free=bias_free, eps=eps, interpret=interpret,
        prepadded=(w, c), padded_out=True,
    )
