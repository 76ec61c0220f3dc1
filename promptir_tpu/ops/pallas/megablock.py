"""Merged TransformerBlock tail + next block's stats pass (prototype).

In the padded-layout chain (ops/pallas/block.py), block n's tail writes x3
to HBM and block n+1's stats pass immediately reads it back — a full
activation-sized round trip (~0.66 ms at 8x512^2x96) plus a second set of
halo fetches. This kernel fuses the two: while the tail's result stripe is
still in registers, it runs the NEXT block's LN -> qkv -> depthwise-conv
statistics on it.

The catch is stripe skew: the stats of stripe j needs x3 rows j*th-1 ..
j*th+th, and the bottom halo row belongs to stripe j+1, which no program
has computed yet when stripe j's tail finishes. So the stats lag one
stripe behind the tail: program i computes the tail for stripe i and the
stats for stripe i-1, holding the previous stripe (plus one carry row) in
persistent VMEM scratch. The grid gets one extra trailing program per
image that computes only the final stripe's stats (its bottom halo is the
image border, which the stats border mask zeroes anyway). Output block
index maps are clamped (min/max) so the extra program revisits — without
rewriting — its neighbours' blocks.

Status: correct but MEASURED SLOWER — not wired into the models.
At 8x512^2x96 the merged kernel runs 29.9 ms/block-pair vs 27.8 for the
two-kernel sequence: the saved x3 HBM read (~0.7 ms) is outweighed by the
dynamic (clamped) output/input index maps and the larger per-program
working set disrupting the auto-pipeline's multiple buffering (the same
effect that made bigger tail stripes slower). Kept as the measured answer
to "why not fuse across blocks?", with the parity test pinning it
(tests/test_pallas_kernels.py::test_merged_tail_stats*); revisit only if
Mosaic's pipeliner learns static reasoning about clamped maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from promptir_tpu.ops.pallas import gdfn as _gdfn_mod
from promptir_tpu.ops.pallas import mdta as _mdta
from promptir_tpu.ops.pallas.gdfn import _lanes, _pad_last


def _pick_th_merged(h, w, cp, two_f, width, vmem_budget=None):
    """Stripe height fitting the tail working set + the stats pass's qkv
    hidden + the rolling x3 scratch."""
    vmem_budget = _gdfn_mod.VMEM_BUDGET if vmem_budget is None else vmem_budget
    two_fp = _lanes(two_f)
    wp = w + 2 + ((-(w + 2)) % 8)
    for th in (32, 16, 8, 4, 2):
        if h % th:
            continue
        x_blocks = (th + 2) * wp * cp * 2 * 2
        v_blocks = (th + 2) * w * cp * 2 * 2
        x2 = (th + 2) * wp * cp * 4
        hidden = (th + 2) * wp * two_fp * 4
        acc = th * w * two_fp * 4
        out = th * w * cp * 4 * 2
        qkv = (th + 2) * wp * width * 4
        scratch = (th + 1) * wp * cp * 2
        v2 = th * w * cp * 4
        if (x_blocks + v_blocks + x2 + hidden + acc + out + qkv + scratch
                + v2 < vmem_budget):
            return th
    return None


def _merged_kernel(
    vb_ref, xb_ref, v_hbm, x_hbm, attn_ref, wproj_ref,
    ln2w_ref, ln2b_ref, w1_ref, wdwf_ref, w2_ref,
    ln1w_ref, ln1b_ref, wqkv_ref, wdwa_ref,
    out_ref, v2_ref, sqk_ref, ssqq_ref, ssqk_ref,
    vhalo_ref, xhalo_ref, sem, s_scratch,
    *, th, w, wp, c_real, bias_free, eps, qkp,
):
    cp = xb_ref.shape[-1]
    i = pl.program_id(1)
    bi = pl.program_id(0)
    num_t = pl.num_programs(1) - 1  # tail stripes; the +1 program is stats-only
    h_total = th * num_t

    # ---- tail for stripe i (garbage at the trailing i == num_t program —
    # its inputs clamp to the last stripe and the result is never written)
    xtop, xbot = _gdfn_mod.fetch_row_halos(x_hbm, xhalo_ref, sem.at[0],
                                           bi, i, th, h_total)
    vtop, vbot = _gdfn_mod.fetch_row_halos(v_hbm, vhalo_ref, sem.at[1],
                                           bi, i, th, h_total)
    xt = jnp.concatenate([xtop, xb_ref[0], xbot], axis=0)
    vt = jnp.concatenate([vtop, vb_ref[0], vbot], axis=0)

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
    o_wide = jnp.concatenate(
        [
            jnp.zeros((th + 2, 1, cp), jnp.float32),
            o,
            jnp.zeros((th + 2, wp - w - 1, cp), jnp.float32),
        ],
        axis=1,
    )
    x2 = xt.astype(jnp.float32) + o_wide

    ffn = _gdfn_mod.ln_gdfn_stripe(
        x2, i, ln2w_ref, ln2b_ref, w1_ref, wdwf_ref, w2_ref, xt.dtype,
        th=th, w=w, wp=wp, c_real=c_real, bias_free=bias_free, eps=eps,
        num_i=num_t,  # the +1 stats-only program is not an image stripe
    )
    res = (ffn + x2[1 : th + 1, 1 : w + 1, :]).astype(out_ref.dtype)
    padded_res = jnp.concatenate(
        [
            jnp.zeros((th, 1, cp), out_ref.dtype),
            res,
            jnp.zeros((th, wp - w - 1, cp), out_ref.dtype),
        ],
        axis=1,
    )

    @pl.when(i < num_t)
    def _():
        out_ref[0] = padded_res

    # ---- stats for stripe j = i - 1 of x3, from the rolling scratch:
    # s_scratch[0] is x3_{i-2}'s last row (stripe j's top halo),
    # s_scratch[1:th+1] is x3_{i-1}, bottom halo is this stripe's first row
    @pl.when(i > 0)
    def _():
        window = jnp.concatenate(
            [s_scratch[0 : th + 1], padded_res[0:1]], axis=0
        ).astype(jnp.float32)
        v2, s_qk, ssq_q, ssq_k = _mdta.stats_stripe(
            window, i - 1, ln1w_ref, ln1b_ref, wqkv_ref, wdwa_ref,
            out_ref.dtype, th=th, w=w, wp=wp, c_real=c_real, cp=cp,
            bias_free=bias_free, eps=eps, qkp=qkp, num_j=num_t,
        )
        v2_ref[0] = v2.astype(v2_ref.dtype)

        @pl.when(i == 1)
        def _():
            sqk_ref[0] = s_qk
            ssqq_ref[0] = ssq_q
            ssqk_ref[0] = ssq_k

        @pl.when(i > 1)
        def _():
            sqk_ref[0] += s_qk
            ssqq_ref[0] += ssq_q
            ssqk_ref[0] += ssq_k

    # ---- roll the scratch for the next program (read row th first: the
    # 1:th+1 write below overwrites it)
    s_scratch[0:1] = s_scratch[th : th + 1]
    s_scratch[1 : th + 1] = padded_res


def fused_tail_stats_padded(
    v: jnp.ndarray,
    xp: jnp.ndarray,
    attn: jnp.ndarray,
    w_proj: jnp.ndarray,
    ln2_w, ln2_b, w1, wdw, w2,
    ln1_w, ln1_b, w_qkv, w_dwa,
    *,
    w: int,
    c: int,
    bias_free: bool = False,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Block n's tail + block n+1's stats in one kernel (padded layout).

    v/attn: block n's stats outputs; xp: (B,H,wp,cp) padded input of block
    n; tail weights of block n; ln1/wqkv/wdwa: block n+1's stats weights.
    Returns (x3_padded, v2, (s_qk, ssq_q, ssq_k, qkp)) — feed the stats
    tuple to `mdta.attn_from_stats` with block n+1's temperature, or None
    if no stripe fits VMEM.
    """
    b, h, wp, cp = xp.shape
    assert cp == _lanes(c) and wp == w + 2 + ((-(w + 2)) % 8)
    two_f = w1.shape[1]
    f = two_f // 2
    fpad = _lanes(f)
    dtype = xp.dtype

    ln1_b = jnp.zeros_like(ln1_w) if ln1_b is None else ln1_b
    ln2_b = jnp.zeros_like(ln2_w) if ln2_b is None else ln2_b
    ln1w_p, ln1b_p, wqkv_p, wdwa_p, qkp = _mdta.prep_stats_weights(
        ln1_w, ln1_b, w_qkv, w_dwa, c, cp
    )
    width = wqkv_p.shape[1]
    sdim = qkp if qkp else cp
    th = _pick_th_merged(h, w, cp, two_f, width)
    if th is None:
        return None

    ln2w_p = _pad_last(ln2_w, cp)
    ln2b_p = _pad_last(ln2_b, cp)
    w1_p = jnp.concatenate(
        [
            _pad_last(jnp.pad(w1[:, :f], ((0, cp - c), (0, 0))), fpad),
            _pad_last(jnp.pad(w1[:, f:], ((0, cp - c), (0, 0))), fpad),
        ],
        axis=-1,
    )
    wdwf_p = jnp.concatenate(
        [_pad_last(wdw[:, :, :f], fpad), _pad_last(wdw[:, :, f:], fpad)],
        axis=-1,
    )
    w2_p = jnp.pad(w2, ((0, fpad - f), (0, cp - c)))
    wproj_p = jnp.pad(w_proj, ((0, cp - c), (0, cp - c)))

    num_t = h // th
    grid = (b, num_t + 1)
    last = num_t - 1

    kern = functools.partial(
        _merged_kernel, th=th, w=w, wp=wp, c_real=c,
        bias_free=bias_free, eps=eps, qkp=qkp,
    )
    clamp_i = lambda bi, i: (bi, jnp.minimum(i, last), 0, 0)  # noqa: E731
    out, v2, s_qk, ssq_q, ssq_k = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, cp), clamp_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wp, cp), clamp_i, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # v, halo rows by DMA
            pl.BlockSpec(memory_space=pltpu.ANY),  # x, halo rows by DMA
            pl.BlockSpec(
                (1, cp, cp), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((cp, cp), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp,), lambda *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp,), lambda *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (cp, 2 * fpad), lambda *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, 3, 2 * fpad), lambda *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((fpad, cp), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp,), lambda *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp,), lambda *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (cp, width), lambda *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, 3, width), lambda *_: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, th, wp, cp), clamp_i, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, th, w, cp),
                lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0, 0),
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
            jax.ShapeDtypeStruct((b, h, wp, cp), dtype),
            jax.ShapeDtypeStruct((b, h, w, cp), dtype),
            jax.ShapeDtypeStruct((b, sdim, sdim), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, sdim), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, w, cp), dtype),
            pltpu.VMEM((2, 2, wp, cp), dtype),
            pltpu.SemaphoreType.DMA((2, 2, 2)),
            pltpu.VMEM((th + 1, wp, cp), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # sequential stripes: rolling scratch + halo prefetch + Gram
            # accumulation all assume i-order within each bi
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_gdfn_mod.VMEM_LIMIT,
        ),
        interpret=interpret,
    )(v, xp, v, xp, attn, wproj_p.astype(dtype), ln2w_p.astype(dtype),
      ln2b_p.astype(dtype), w1_p.astype(dtype), wdwf_p.astype(dtype),
      w2_p.astype(dtype), ln1w_p.astype(dtype), ln1b_p.astype(dtype),
      wqkv_p.astype(dtype), wdwa_p.astype(dtype))
    return out, v2, (s_qk, ssq_q, ssq_k, qkp)
