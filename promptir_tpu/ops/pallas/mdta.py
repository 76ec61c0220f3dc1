"""Fused LayerNorm + MDTA as two Pallas TPU kernels.

The attention branch `x + MDTA(LN(x))` (/root/reference/net/model.py:193)
moves ~15 x-sized tensors through HBM when unfused (LN, 1x1 qkv to 3C,
depthwise 3x3 on 3C, L2 norms, two einsums, out-proj). Two observations
make it collapse:

  * channel attention is GLOBAL over pixels but TINY over channels: the
    logits need only S_qk[i,j] = sum_s q[s,i] k[s,j] (C x C) plus the
    per-channel norms — and the reference's L2 normalization is separable:
    softmax over normalize(q) @ normalize(k)^T == softmax(S_qk[i,j] /
    (||q_i|| ||k_j||)), so UN-normalized accumulators suffice;
  * q and k are never needed again after those accumulators.

Kernel A streams x in row stripes: LN -> qkv matmul -> depthwise 3x3, then
writes only v to HBM while accumulating S_qk (C x C) and the squared norms
across stripes (grid revisiting). The C x C softmax happens in XLA (tiny).
Kernel B streams v: out = (attn @ v) -> 1x1 out-proj -> + x residual.
HBM traffic: read x twice, write+read v once, write out once — ~5 x-sized
transfers instead of ~15, and q/k never exist in HBM.

The raw kernels are forward-only; `ops/pallas/autodiff.py` adds the
`custom_vjp` (backward = remat through the unfused XLA composition) that
makes the models' `fused_ffn` flag differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from promptir_tpu.ops.pallas import gdfn as _gdfn_mod
from promptir_tpu.ops.pallas.gdfn import _lanes


def _pick_th(h: int, w: int, cp: int, vmem_budget=None):
    # taller stripes amortize the 2 halo rows and per-program overhead —
    # see gdfn._pick_th; v5e has 128 MB VMEM so 44 MB of blocks is safe
    # (th=16 at 512px; th=32 measured no faster)
    if w % 8:
        # halo-row DMAs slice (1, w, cp) rows out of the unpadded hidden
        # buffers; Mosaic requires sublane-dim slices 8-aligned (fails at
        # e.g. the 28px latent of a 224px input). Such levels are tiny —
        # the XLA fallback path handles them.
        return None
    vmem_budget = _gdfn_mod.VMEM_BUDGET if vmem_budget is None else vmem_budget
    for th in (64, 32, 16, 8, 4, 2):
        if h % th:
            continue
        qkv_bytes = (th + 2) * (w + 8) * 3 * cp * 4 * 2  # fp32 qkv
        x_bytes = (th + 2) * (w + 8) * cp * 2 * 2
        s_bytes = cp * cp * 4 * 2
        total = qkv_bytes + x_bytes + s_bytes
        if _gdfn_mod.MICROTILE:
            # persistent hidden + dw-output scratch (A/B experiment path)
            total += (2 * th + 2) * (w + 8) * 3 * cp * 4
        if total < vmem_budget:
            return th
    return None


def stats_stripe(xf, j, lnw_ref, lnb_ref, wqkv_ref, wdw_ref, io_dtype,
                 *, th, w, wp, c_real, cp, bias_free, eps, qkp, num_j=None,
                 mt_refs=None):
    """The stats compute for ONE (th+2, wp, cp) fp32 window of stripe j:
    LN -> border-masked qkv matmul -> depthwise taps -> split into
    (v, s_qk, ssq_q, ssq_k) partial statistics (NOT yet accumulated across
    stripes). Shared by kernel A and the merged tail+stats kernel
    (ops/pallas/megablock.py), whose window index j is shifted relative to
    its grid position."""
    y = _gdfn_mod.ln_stripe(xf, lnw_ref, lnb_ref, c_real, bias_free, eps)
    # the dwconv zero-pads at global borders; x's zero pad produced nonzero
    # LN output in halo lines — mask y (cp lanes) before the linear qkv
    # matmul instead of qkv (3cp lanes) after: equivalent, cheaper select
    y = jnp.where(
        _gdfn_mod.border_mask(j, th, w, wp, num_j), 0, y
    ).astype(io_dtype)

    qkv = jax.lax.dot_general(
        y.reshape(-1, cp), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(th + 2, wp, wqkv_ref.shape[-1])

    if mt_refs is not None and w % 8 == 0:
        hidden_ref, acc_ref = mt_refs
        hidden_ref[:] = qkv
        _gdfn_mod.dwconv3x3_microtile(hidden_ref, acc_ref, wdw_ref, th, w)
        acc = acc_ref[:]
    else:
        acc = _gdfn_mod.dwconv3x3_stripe(qkv, wdw_ref, th, w)

    if qkp:
        slab = acc[:, :, :qkp].reshape(-1, qkp)
        v = acc[:, :, qkp:]
        sb = slab.astype(jnp.bfloat16)
        # Gram matrix: [0:c, c:2c] block is q^T k
        s_qk = jax.lax.dot_general(
            sb, sb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ssq_q = jnp.sum(
            jnp.square(slab.astype(jnp.float32)), axis=0, keepdims=True
        )
        ssq_k = jnp.zeros((1, cp), jnp.float32)
    else:
        q = acc[:, :, :cp].reshape(-1, cp)
        k = acc[:, :, cp : 2 * cp].reshape(-1, cp)
        v = acc[:, :, 2 * cp :]
        qb = q.astype(jnp.bfloat16)
        kb = k.astype(jnp.bfloat16)
        s_qk = jax.lax.dot_general(
            qb, kb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ssq_q = jnp.sum(
            jnp.square(q.astype(jnp.float32)), axis=0, keepdims=True
        )
        ssq_k = jnp.sum(
            jnp.square(k.astype(jnp.float32)), axis=0, keepdims=True
        )
    return v.astype(io_dtype), s_qk, ssq_q, ssq_k


def _kernel_a(xb_ref, x_hbm, lnw_ref, lnb_ref, wqkv_ref, wdw_ref,
              v_ref, sqk_ref, ssqq_ref, ssqk_ref, halo_ref, sem,
              *mt_refs, th, w, wp, c_real, cp, bias_free, eps, qkp=0):
    """qkp > 0 selects the packed-qk layout: qkv columns are
    [q: c_real | k: c_real | zero-pad to qkp | v: zero-pad to cp] instead of
    three cp-padded slabs. For C=48 (the full-resolution level) that cuts
    the depthwise-tap lane count from 3*128 to 128+128 — the kernel is
    VPU-bound in exactly those taps — and S is accumulated as the single
    (qkp, qkp) Gram matrix slab^T slab whose [0:c, c:2c] block is q^T k and
    whose diagonal blocks carry the squared norms' cross terms; the fp32
    norms still come from a direct reduce (ssqq holds [||q||^2 || ||k||^2]
    packed, ssqk is unused/zero in this mode)."""
    i = pl.program_id(1)
    bi = pl.program_id(0)

    # bulk stripe via the auto-pipelined blocked input; 2 halo rows by
    # pipelined DMA (prefetched one program ahead)
    top, bot = _gdfn_mod.fetch_row_halos(
        x_hbm, halo_ref, sem, bi, i, th, th * pl.num_programs(1)
    )
    xt = jnp.concatenate([top, xb_ref[0], bot], axis=0)
    v, s_qk, ssq_q, ssq_k = stats_stripe(
        xt.astype(jnp.float32), i, lnw_ref, lnb_ref, wqkv_ref, wdw_ref,
        xt.dtype, th=th, w=w, wp=wp, c_real=c_real, cp=cp,
        bias_free=bias_free, eps=eps, qkp=qkp,
        mt_refs=mt_refs if mt_refs else None,
    )
    v_ref[0] = v.astype(v_ref.dtype)

    @pl.when(i == 0)
    def _():
        sqk_ref[0] = s_qk
        ssqq_ref[0] = ssq_q
        ssqk_ref[0] = ssq_k

    @pl.when(i > 0)
    def _():
        sqk_ref[0] += s_qk
        ssqq_ref[0] += ssq_q
        ssqk_ref[0] += ssq_k


def prep_stats_weights(ln_w, ln_b, w_qkv, w_dw, c, cp):
    """Pad the stats-pass weights into the kernel layout: LN params to cp
    lanes; qkv/dw either three cp-padded slabs, or the packed-qk layout
    [q: c | k: c | zero-pad to qkp | v: pad to cp] whenever that shrinks
    the depthwise-tap lane count (C=48: 384 -> 256 lanes). Returns
    (lnw_p, lnb_p, wqkv_p, wdw_p, qkp) with qkp == 0 meaning unpacked."""

    def padc(a, axis):
        cfg = [(0, 0)] * a.ndim
        cfg[axis] = (0, cp - c)
        return jnp.pad(a, cfg)

    lnw_p = padc(ln_w, 0)
    lnb_p = padc(ln_b, 0)
    wq, wk, wv = jnp.split(w_qkv, 3, axis=1)
    dq, dk, dv = jnp.split(w_dw, 3, axis=2)
    qkp = _lanes(2 * c) if _lanes(2 * c) < 2 * cp else 0
    if qkp:
        wqkv_p = jnp.concatenate(
            [
                padc(wq, 0),
                padc(wk, 0),
                jnp.zeros((cp, qkp - 2 * c), w_qkv.dtype),
                padc(padc(wv, 0), 1),
            ],
            axis=1,
        )
        wdw_p = jnp.concatenate(
            [dq, dk, jnp.zeros((3, 3, qkp - 2 * c), w_dw.dtype),
             padc(dv, 2)],
            axis=2,
        )
    else:
        wqkv_p = jnp.concatenate(
            [padc(padc(t, 0), 1) for t in (wq, wk, wv)], axis=1
        )
        wdw_p = jnp.concatenate([padc(t, 2) for t in (dq, dk, dv)], axis=2)
    return lnw_p, lnb_p, wqkv_p, wdw_p, qkp


def attn_from_stats(s_qk, ssq_q, ssq_k, temperature, c, cp, num_heads, qkp):
    """The tiny host-side step: accumulated Gram statistics -> (B, cp, cp)
    block-diagonal attention matrix (normalize, temperature, per-head
    block mask, softmax)."""
    b = s_qk.shape[0]
    d = c // num_heads
    if qkp:
        nq = jnp.sqrt(jnp.maximum(ssq_q[:, 0, :c], 1e-24))
        nk = jnp.sqrt(jnp.maximum(ssq_q[:, 0, c : 2 * c], 1e-24))
        s = s_qk[:, :c, c : 2 * c]
    else:
        nq = jnp.sqrt(jnp.maximum(ssq_q[:, 0, :c], 1e-24))  # (B, C)
        nk = jnp.sqrt(jnp.maximum(ssq_k[:, 0, :c], 1e-24))
        s = s_qk[:, :c, :c]
    logits = s / jnp.maximum(nq[:, :, None] * nk[:, None, :], 1e-12)
    hb = jnp.arange(c) // d
    same_head = hb[:, None] == hb[None, :]
    temp = temperature.astype(jnp.float32)[hb]  # (C,) per-row temperature
    logits = logits * temp[None, :, None]
    logits = jnp.where(same_head[None], logits, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=-1)  # (B, C, C) block-diagonal
    return jnp.zeros((b, cp, cp), jnp.float32).at[:, :c, :c].set(attn)


def _kernel_b(v_ref, x_ref, attn_ref, wproj_ref, out_ref, *, cp):
    v = v_ref[0]  # (th, w, cp)
    th, w, _ = v.shape
    # out[s, i] = sum_j attn[i, j] v[s, j]  (attn already per-head blocked)
    av = jax.lax.dot_general(
        v.reshape(-1, cp), attn_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    out = jax.lax.dot_general(
        av, wproj_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(th, w, cp)
    out_ref[0] = (out + x_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def fused_ln_mdta(
    x: jnp.ndarray,
    ln_w: jnp.ndarray,
    ln_b: jnp.ndarray | None,
    w_qkv: jnp.ndarray,
    w_dw: jnp.ndarray,
    w_proj: jnp.ndarray,
    temperature: jnp.ndarray,
    num_heads: int,
    *,
    bias_free: bool = False,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """x + MDTA(LN(x)) fused. w_qkv: (C,3C); w_dw: (3,3,3C); w_proj: (C,C);
    temperature: (heads,). Returns (B,H,W,C) or None if no stripe fits."""
    stats = mdta_stats(
        x, ln_w, ln_b, w_qkv, w_dw, temperature, num_heads,
        bias_free=bias_free, eps=eps, interpret=interpret,
    )
    if stats is None:
        return None
    v_arr, attn_p = stats
    b, h, w, c = x.shape
    cp = _lanes(c)
    th = _pick_th(h, w, cp)
    dtype = x.dtype
    grid = (b, h // th)

    kern_b = functools.partial(_kernel_b, cp=cp)
    out = pl.pallas_call(
        kern_b,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, th, w, cp), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, w, cp), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cp, cp), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cp, cp), lambda *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, cp), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cp), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_gdfn_mod.VMEM_LIMIT,
        ),
        interpret=interpret,
    )(v_arr, jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c))),
      attn_p, jnp.pad(w_proj, ((0, cp - c), (0, cp - c))).astype(dtype))
    return out[:, :, :, :c] if cp != c else out


def mdta_stats(
    x: jnp.ndarray,
    ln_w: jnp.ndarray,
    ln_b: jnp.ndarray | None,
    w_qkv: jnp.ndarray,
    w_dw: jnp.ndarray,
    temperature: jnp.ndarray,
    num_heads: int,
    *,
    bias_free: bool = False,
    eps: float = 1e-5,
    interpret: bool = False,
    prepadded: tuple | None = None,
):
    """Kernel A + the tiny host-side softmax: LN -> qkv -> dwconv, with v
    streamed to HBM and the (B, cp, cp) block-diagonal attention matrix
    built from the accumulated Gram statistics.

    Returns (v, attn) with v: (B,H,W,cp) in x.dtype and attn: (B,cp,cp) in
    x.dtype — the inputs of the apply pass (kernel B or the fused block
    tail in ops/pallas/block.py) — or None if no stripe fits VMEM.

    `prepadded=(w, c)` declares x already in the kernel's padded layout
    (B, H, wp, cp) with zero pad columns/lanes (see block.py:pad_nhwc) —
    the chain mode that spares the per-block XLA pad copy.
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
            "prepadded x must be in block.py:pad_nhwc layout"
        )
        xp = x
    d = c // num_heads
    th = _pick_th(h, w, cp)
    if th is None or cp % num_heads:
        return None
    # padded per-head split must stay aligned: pad via whole-C padding and
    # head-block the attention matrix on the host side instead
    if ln_b is None:
        ln_b = jnp.zeros_like(ln_w)
    dtype = x.dtype

    lnw_p, lnb_p, wqkv_p, wdw_p, qkp = prep_stats_weights(
        ln_w, ln_b, w_qkv, w_dw, c, cp
    )
    width = wqkv_p.shape[1]
    sdim = qkp if qkp else cp

    kern_a = functools.partial(
        _kernel_a, th=th, w=w, wp=wp, c_real=c, cp=cp,
        bias_free=bias_free, eps=eps, qkp=qkp,
    )
    grid = (b, h // th)
    v_arr, s_qk, ssq_q, ssq_k = pl.pallas_call(
        kern_a,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, th, wp, cp), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((cp,), lambda *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp,), lambda *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (cp, width), lambda *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, 3, width), lambda *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, th, w, cp), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, sdim, sdim), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, sdim), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, cp), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, cp), dtype),
            jax.ShapeDtypeStruct((b, sdim, sdim), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, sdim), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, wp, cp), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        + (
            [
                pltpu.VMEM((th + 2, wp, width), jnp.float32),
                pltpu.VMEM((th, w, width), jnp.float32),
            ]
            if _gdfn_mod.MICROTILE and w % 8 == 0
            else []
        ),
        compiler_params=pltpu.CompilerParams(
            # i accumulates S across stripes: must stay sequential
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_gdfn_mod.VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xp, xp, lnw_p.astype(dtype), lnb_p.astype(dtype),
      wqkv_p.astype(dtype), wdw_p.astype(dtype))

    # --- tiny host-side attention over channel blocks ---
    attn_p = attn_from_stats(
        s_qk, ssq_q, ssq_k, temperature, c, cp, num_heads, qkp
    )
    return v_arr, attn_p.astype(dtype)
