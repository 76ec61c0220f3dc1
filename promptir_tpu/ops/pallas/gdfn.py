"""Fused LayerNorm + GDFN + residual as one Pallas TPU kernel.

The transformer block's FFN branch `x + GDFN(LN(x))`
(/root/reference/net/model.py:194) is the model's largest byte mover when
left to XLA: LN, the 1x1 expansion to 2*int(2.66C) channels, the depthwise
3x3, the gelu gate, and the 1x1 projection each round-trip full-resolution
activations through HBM (~3 GB per level-1 block at 4x512^2).

This kernel streams x through VMEM in full-width row stripes: LN statistics
in fp32 registers, the two 1x1 convs as MXU matmuls, the depthwise 3x3 as
9 shifted multiply-adds on the VPU, gate + residual fused — one x-sized
HBM read (plus a 2-row halo per stripe) and one write.

Mosaic's manual-DMA alignment rules shape the layout: slices must be whole
multiples of the (8, 128) tiling on the two minor dims, so the caller pads
W+2 up to a multiple of 8 and C up to a multiple of 128 (zero channels;
LN uses the real-channel divisor and zero-padded weights keep the padding
inert). Padding costs one extra x-sized copy — small against the fusion's
multi-GB saving.

The raw kernel is forward-only; `ops/pallas/autodiff.py` wraps it in a
`custom_vjp` (backward = remat through the unfused XLA composition) so the
models' `fused_ffn` flag works under both inference and `jax.grad`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lanes(c: int) -> int:
    return (c + 127) // 128 * 128


# Stripe working-set budget and Mosaic scoped-vmem ceiling, sized for the
# v5e's 128 MB VMEM. On smaller-VMEM parts set PROMPTIR_VMEM_BUDGET_MB /
# PROMPTIR_VMEM_LIMIT_MB (e.g. 8 / 16) — shapes whose smallest stripe
# exceeds the budget fall back to the XLA path instead of failing compile.
import os as _os

VMEM_BUDGET = int(_os.environ.get("PROMPTIR_VMEM_BUDGET_MB", "44")) * 2**20
VMEM_LIMIT = int(_os.environ.get("PROMPTIR_VMEM_LIMIT_MB", "100")) * 2**20


def _mxu_pairs(fpad: int) -> int:
    """Hybrid-dw split point: how many gate-pair channels (of the fpad
    padded pairs) the depthwise 3x3 computes on the MXU as im2col
    tap-matmuls instead of VPU shifted FMAs (see ln_gdfn_stripe).

    The kernels are VPU-pass-count-bound with the MXU mostly hidden
    (PROFILE.md): routing a lane-multiple of pairs through the expansion
    matmul trades 9 FMA passes per 128 pair-lanes for MXU FLOPs that
    overlap the remaining VPU work. PROMPTIR_DW_MXU_FRAC (0..1, default
    0) picks the fraction, rounded to a 128-lane multiple; the microtile
    experiment path bypasses it.

    MEASURED ON v5e (8x512^2x96 bf16): standalone GDFN kernel 18.31 ->
    17.91 ms at s=128 (+2.2%) but 22.20 ms at s=256 (full-MXU is
    MXU-bound), and the whole fused BLOCK — the path the models actually
    take — regresses 23.96 -> 24.63 ms at s=128: the block tail's MXU
    already runs the attention-apply + projection matmuls, so the extra
    9x tap FLOPs don't hide there. Default stays 0 (off); kept as a
    parity-tested option since the standalone-kernel users (e.g. the
    X-Restormer channel half) can profit."""
    if MICROTILE:
        return 0
    frac = float(_os.environ.get("PROMPTIR_DW_MXU_FRAC", "0"))
    # nearest-128 with half-up so frac=0.5 at fpad=128 means "all MXU"
    s = int(fpad * frac / 128.0 + 0.5) * 128
    return max(0, min(fpad, s))


def _split_dw_weights(w1, wdw, c, f, cp, fpad, s):
    """Weight prep for the hybrid dw split at pair channel `s`.

    Returns (w1m, w1v, wdwv): `w1m` is (9*cp, 2s) — tap-row blocks in the
    stripe body's im2col order (di-major, dj-minor), each block
    W1[:, pair]*dw[di,dj,pair] for the first s pairs of BOTH gate halves
    — and `w1v`/`wdwv` carry pairs [s, fpad) in the usual padded-half
    layout. s=0 reproduces the plain (w1_p, wdw_p) layout with w1m=None;
    s=fpad returns inert zero v-weights (the kernel skips them
    statically)."""
    h1 = _pad_last(jnp.pad(w1[:, :f], ((0, cp - c), (0, 0))), fpad)
    h2 = _pad_last(jnp.pad(w1[:, f:], ((0, cp - c), (0, 0))), fpad)
    d1 = _pad_last(wdw[:, :, :f], fpad)
    d2 = _pad_last(wdw[:, :, f:], fpad)
    fv = fpad - s
    if fv:
        w1v = jnp.concatenate([h1[:, s:], h2[:, s:]], axis=-1)
        wdwv = jnp.concatenate([d1[..., s:], d2[..., s:]], axis=-1)
    else:
        w1v = jnp.zeros((cp, 256), w1.dtype)
        wdwv = jnp.zeros((3, 3, 256), wdw.dtype)
    if s == 0:
        return None, w1v, wdwv
    taps = [
        jnp.concatenate(
            [
                h1[:, :s] * d1[di, dj, :s][None, :],
                h2[:, :s] * d2[di, dj, :s][None, :],
            ],
            axis=-1,
        )
        for di in range(3)
        for dj in range(3)
    ]
    return jnp.concatenate(taps, axis=0), w1v, wdwv


def _pick_th(h: int, w: int, c: int, two_f: int, vmem_budget=None, s=None):
    """Largest row-stripe height whose working set fits VMEM.

    Taller stripes matter more than VMEM frugality: the 2 halo rows mean
    (th+2)/th overcompute on LN + the expansion matmul + the taps, and each
    program pays fixed DMA/issue overhead — th=4 measured ~25% slower than
    th=16 at 4x512^2x48 on v5e (128 MB VMEM). `s` = hybrid-dw MXU pair
    count (adds the im2col + fp32 m-accumulator, shrinks the VPU hidden)."""
    if w % 8:
        # halo-row DMAs slice (1, w, cp) rows out of the unpadded hidden
        # buffers; Mosaic requires sublane-dim slices 8-aligned (fails at
        # e.g. the 28px latent of a 224px input). Such levels are tiny —
        # the XLA fallback path handles them.
        return None
    vmem_budget = VMEM_BUDGET if vmem_budget is None else vmem_budget
    if s is None:
        s = _mxu_pairs(two_f // 2)
    two_fv = two_f - 2 * s
    for th in (64, 32, 16, 8, 4, 2):
        if h % th:
            continue
        x_bytes = (th + 2) * (w + 8) * _lanes(c) * 2 * 2  # tile + LN copy
        hidden = (th + 2) * (w + 8) * _lanes(two_fv) * 4 if two_fv else 0
        acc = th * w * _lanes(two_fv) * 4 if two_fv else 0
        out = th * w * _lanes(c) * 4
        total = x_bytes + hidden + acc + out
        if s:
            total += th * w * 9 * _lanes(c) * 2  # im2col (io dtype)
            total += th * w * 2 * s * 4  # fp32 m-accumulator
        if MICROTILE:
            # persistent hidden + gated scratch on top of the streamed
            # working set (the A/B experiment path)
            total += hidden + acc // 2
        if total < vmem_budget:
            return th
    return None


def _erf_invsqrt2(x):
    """Rational P4(t)/Q3(t) minimax for erf(x/sqrt(2)) on |x| <= 4.2*sqrt2
    (t = x^2; max abs err 4.0e-6 erf-space / 1.5e-5 gelu-space in fp32
    Horner, clamp-only — erf(4.2) is within 3e-9 of saturation, so no
    branch/select is needed for the tails). The gelu's 1/sqrt(2) argument
    scale is absorbed into the coefficients (tools/fit_erf.py), saving one
    full-stripe VPU multiply pass per gelu vs scaling the argument.

    Mosaic has no erf primitive, and v5e has no bf16 comparison, so the
    tails are handled by the fp32 clamp alone (no jnp.where / sign).
    Q's roots are all at t < 0: no poles on the clamped range. The error
    is below the 2e-5 kernel parity tolerance. (The exp-based A&S 7.1.26
    form measured the same speed as a same-width rational — op-pass count
    is what matters on this VPU, not transcendental cost.)"""
    p0, p1, p2, p3, p4 = (
        0.7979043150908658, 0.05728321232279784, 0.008505673201182817,
        0.00010111308896982461, -2.3053941838259433e-07,
    )
    q1, q2, q3 = (
        0.23857159256247892, 0.025280799432728717, 0.001434531404306148,
    )
    u = jnp.clip(x.astype(jnp.float32), -5.939696961967, 5.939696961967)
    u = u.astype(x.dtype)
    t = u * u
    num = ((((p4 * t + p3) * t + p2) * t + p1) * t) + p0
    den = ((q3 * t + q2) * t + q1) * t + 1.0
    return u * (num / den)


def _halo_copies(x_hbm, dst, sem, bi, i, th, h_total):
    """The two async copies for program (bi, i)'s halo rows (border rows
    clamped — the caller's border mask zeroes them anyway)."""
    top_row = jnp.maximum(i * th - 1, 0)
    bot_row = jnp.minimum(i * th + th, h_total - 1)
    return (
        pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(top_row, 1), :, :], dst.at[0:1], sem.at[0]
        ),
        pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(bot_row, 1), :, :], dst.at[1:2], sem.at[1]
        ),
    )


def fetch_row_halos(x_hbm, halo2_ref, sem2, bi, i, th, h_total):
    """Halo rows for program (bi, i), software-pipelined: program i issues
    the DMA for stripe i+1 before waiting on its own, so the ~2-3 us
    per-transfer latency overlaps the previous program's compute (measured
    ~1.3 ms of a 22 ms GDFN kernel call at 512 programs when synchronous).

    halo2_ref: (2, 2, wp, cp) ping-pong scratch; sem2: DMA sems (2, 2).
    Requires the stripe grid dim (1) to run sequentially within each bi
    ('arbitrary' semantics); each bi column is self-contained (i == 0
    fetches its own rows), so bi-dim ordering doesn't matter.
    Returns (top, bot) rows, each (1, wp, cp).

    The final select reads BOTH slots and discards the one whose DMA may
    still be in flight (the just-issued prefetch) — a benign race: the
    racing lanes never reach the output, and VMEM reads don't fault.
    """
    num_i = pl.num_programs(1)
    par = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        for c in _halo_copies(
            x_hbm, halo2_ref.at[0], sem2.at[0], bi, i, th, h_total
        ):
            c.start()

    @pl.when((i + 1 < num_i) & (par == 0))
    def _():
        for c in _halo_copies(
            x_hbm, halo2_ref.at[1], sem2.at[1], bi, i + 1, th, h_total
        ):
            c.start()

    @pl.when((i + 1 < num_i) & (par == 1))
    def _():
        for c in _halo_copies(
            x_hbm, halo2_ref.at[0], sem2.at[0], bi, i + 1, th, h_total
        ):
            c.start()

    @pl.when(par == 0)
    def _():
        for c in _halo_copies(
            x_hbm, halo2_ref.at[0], sem2.at[0], bi, i, th, h_total
        ):
            c.wait()

    @pl.when(par == 1)
    def _():
        for c in _halo_copies(
            x_hbm, halo2_ref.at[1], sem2.at[1], bi, i, th, h_total
        ):
            c.wait()

    top = jnp.where(par == 0, halo2_ref[0, 0:1], halo2_ref[1, 0:1])
    bot = jnp.where(par == 0, halo2_ref[0, 1:2], halo2_ref[1, 1:2])
    return top, bot


def ln_stripe(xf, lnw_ref, lnb_ref, c_real, bias_free, eps):
    """LayerNorm of an fp32 stripe over the REAL channels: zero-padded
    lanes contribute nothing to the sums, so divide by c_real and use
    sumsq - mu^2 for the variance; zero-padded lnw/lnb keep pad lanes 0."""
    ssum = jnp.sum(xf, axis=-1, keepdims=True)
    ssq = jnp.sum(jnp.square(xf), axis=-1, keepdims=True)
    mu = ssum / c_real
    var = ssq / c_real - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    if bias_free:
        return xf * inv * lnw_ref[:].astype(jnp.float32)
    return (xf - mu) * inv * lnw_ref[:].astype(jnp.float32) + lnb_ref[
        :
    ].astype(jnp.float32)


def border_mask(i, th, w, wp, num_i=None):
    """True where a stripe row/col lies outside the image (the dwconv
    zero-pads there, but x's zero padding comes out of LN nonzero).
    Masks are built 3-D: Mosaic can't reshape 2-D i1 vectors.

    `i` is the stripe index of the window being masked and `num_i` the
    stripe count — defaults to this program's grid position (the common
    case); the merged tail+stats kernel masks a SHIFTED stripe."""
    if num_i is None:
        num_i = pl.num_programs(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 1)
    invalid = (cols == 0) | (cols >= w + 1)
    invalid = invalid | ((rows == 0) & (i == 0))
    invalid = invalid | ((rows == th + 1) & (i == num_i - 1))
    return invalid


def dwconv3x3_stripe(hidden, wdw_ref, th, w):
    """Depthwise 3x3 as 9 shifted multiply-adds (VPU), all fp32.

    Every cheaper-looking variant re-measured no faster at 8x512^2x96:
    bf16 taps 25.7 vs 21.4 ms (v5e has no packed-bf16 ALU — each bf16 op
    unpacks/repacks around fp32), hoisted width-shifts 23.2 vs 22.3 (the
    slices aren't rotation-bound), split accumulators 22.6 vs 22.3 (no
    dependency-chain stall). One elementwise pass over an 8-image
    512-row 256-lane fp32 stripe costs ~0.4 ms whatever the op — pass
    COUNT is the only lever, so keep the straightforward 9-FMA form."""
    two_fp = hidden.shape[-1]
    acc = jnp.zeros((th, w, two_fp), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc = acc + hidden[di : di + th, dj : dj + w, :] * wdw_ref[
                di, dj, :
            ].astype(jnp.float32)
    return acc


def dw_gelu_gate_microtile(hidden_ref, gated_ref, wdw_ref, th, w, fpad):
    """Fused depthwise-3x3 + gelu-gate over register-resident microtiles.

    The statement-per-pass form (dwconv3x3_stripe + the gelu/gate chain)
    streams every intermediate through VMEM: each tap is a full-stripe
    read-modify-write (~12 B per hidden element per tap) and the gelu
    chain adds ~10 more full passes — the measured cost model
    (PROFILE.md) is ~0.4 ms per 128-lane pass whatever the op, i.e. the
    section is VMEM-bandwidth bound, not FLOP bound. This variant walks
    (8-sublane x 128-lane) output microtiles in a fori_loop keeping both
    gate accumulators AND the whole gelu chain in vector registers: per
    gated element ~18 tile loads + 1 store instead of ~60 streamed
    passes' worth of traffic. Ref-based (pl.load/pl.store into VMEM
    scratch) so the loop carries no arrays.

    hidden_ref: (th+2, wp, 2*fpad) fp32 scratch, pre-filled (border
    cols/rows already zeroed via the y mask); gated_ref: (th, w, fpad)
    fp32 scratch this fills. Requires w % 8 == 0.
    """
    nw = w // 8
    ngroups = fpad // 128

    def body(t, carry):
        r = t // nw
        # Mosaic vector loads need sublane starts provably 8-aligned: load
        # aligned 16-sublane windows and take the dj shifts as STATIC
        # register slices (also 3x fewer loads than per-tap loads)
        ws = pl.multiple_of((t % nw) * 8, 8)
        for g in range(ngroups):
            lanes1 = slice(g * 128, (g + 1) * 128)
            lanes2 = slice(fpad + g * 128, fpad + (g + 1) * 128)
            a1 = jnp.zeros((8, 128), jnp.float32)
            a2 = jnp.zeros((8, 128), jnp.float32)
            for di in range(3):
                t1 = hidden_ref[r + di, pl.ds(ws, 16), lanes1]
                t2 = hidden_ref[r + di, pl.ds(ws, 16), lanes2]
                for dj in range(3):
                    a1 = a1 + t1[dj : dj + 8] * wdw_ref[
                        di, dj, lanes1
                    ].astype(jnp.float32)
                    a2 = a2 + t2[dj : dj + 8] * wdw_ref[
                        di, dj, lanes2
                    ].astype(jnp.float32)
            gelu = a1 * (0.5 + 0.5 * _erf_invsqrt2(a1))
            gated_ref[r, pl.ds(ws, 8), lanes1] = gelu * a2
        return carry

    jax.lax.fori_loop(0, th * nw, body, 0)


def dwconv3x3_microtile(hidden_ref, out_ref, wdw_ref, th, w):
    """Plain depthwise-3x3 over register microtiles (no gate): the stats
    kernel's variant of dw_gelu_gate_microtile — per output element 9
    tile loads + 1 store instead of 9 read-modify-write passes.
    hidden_ref: (th+2, wp, L) fp32; out_ref: (th, w, L) fp32; L the
    lane-padded channel count. Requires w % 8 == 0."""
    nw = w // 8
    ngroups = out_ref.shape[-1] // 128

    def body(t, carry):
        r = t // nw
        ws = pl.multiple_of((t % nw) * 8, 8)
        for g in range(ngroups):
            lanes = slice(g * 128, (g + 1) * 128)
            a = jnp.zeros((8, 128), jnp.float32)
            for di in range(3):
                tdi = hidden_ref[r + di, pl.ds(ws, 16), lanes]
                for dj in range(3):
                    a = a + tdi[dj : dj + 8] * wdw_ref[
                        di, dj, lanes
                    ].astype(jnp.float32)
            out_ref[r, pl.ds(ws, 8), lanes] = a
        return carry

    jax.lax.fori_loop(0, th * nw, body, 0)


# Flip to route the stripe bodies through the microtile path
# (PROMPTIR_MICROTILE=1; kbench A/B). MEASURED SLOWER on v5e:
# 28.9 vs 18.6 ms (gdfn kernel, 8x512^2x96 bf16) despite ~3x less
# theoretical VMEM traffic — the per-microtile fori_loop body (scalar
# address computation + unpipelined (8/16,128)-granule loads + a
# serialized gelu chain per tile) costs more than the full-stripe
# streaming passes it replaces. Mosaic's big-op streaming at ~0.4 ms per
# 128-lane pass IS the practical optimum for these elementwise sections;
# kept (off by default, interpret-parity-tested) as the documented
# negative result and a revisit point if Mosaic learns to software-
# pipeline loop bodies. First attempt (value-carried fori accumulating
# into a loop-carried array) did not even compile in 30 min; the
# ref-based form needs the pl.multiple_of sublane-alignment hints below.
MICROTILE = _os.environ.get("PROMPTIR_MICROTILE", "0") == "1"


def ln_gdfn_stripe(xf, i, lnw_ref, lnb_ref, w1_ref, wdw_ref, w2_ref,
                   io_dtype, *, th, w, wp, c_real, bias_free, eps,
                   num_i=None, mt_refs=None, w1m_ref=None, s=0,
                   yim_ref=None):
    """GDFN(LN(stripe)) — the body shared by the standalone LN+GDFN kernel
    and the fused block tail (ops/pallas/block.py). xf: (th+2, wp, cp)
    fp32 with zero-padded channels; returns (th, w, cp) fp32 (no residual).
    `num_i` overrides the stripe count for the border mask when the grid
    has extra programs (ops/pallas/megablock.py). `mt_refs` = (hidden,
    gated) VMEM scratch refs routes the dw+gelu+gate section through the
    register-microtile loop (dw_gelu_gate_microtile).

    Hybrid dw (`s` > 0, weights from _split_dw_weights): the first `s`
    gate pairs' expansion AND depthwise 3x3 are one im2col tap-matmul on
    the MXU — dw(W1 y)[p] = sum_tap (W1 * dw_tap) y[p+tap], contraction
    over 9*cp — trading 9 VPU FMA passes per 128 pair-lanes for MXU
    FLOPs that overlap the remaining VPU work. Pairs [s, fpad) go
    through the usual VPU path on the v-weights; the gated concat keeps
    pair order, so w2 is unchanged."""
    cp = xf.shape[-1]
    fpad_total = w2_ref.shape[0]
    fv = fpad_total - s
    y = ln_stripe(xf, lnw_ref, lnb_ref, c_real, bias_free, eps)
    # mask y (cp lanes) before the linear expansion instead of hidden
    # (2F lanes) after: equivalent by linearity, half the select work
    y = jnp.where(border_mask(i, th, w, wp, num_i), 0, y).astype(io_dtype)

    parts = []
    if s:
        # masked y makes the shifted taps see zeros outside the image,
        # matching the dwconv's zero padding. The im2col buffer is built
        # by 9 STORES into VMEM scratch rather than a lane-concat of the
        # shifted slices: Mosaic's tpu.concatenate requires matching
        # sublane offsets on non-concat dims (the dj shifts break that,
        # "result/input offset mismatch"), while stores relayout freely.
        t = 0
        for di in range(3):
            for dj in range(3):
                yim_ref[:, :, t * cp : (t + 1) * cp] = (
                    y[di : di + th, dj : dj + w, :]
                )
                t += 1
        acc_m = jax.lax.dot_general(
            yim_ref[:].reshape(th * w, 9 * cp), w1m_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(th, w, 2 * s)
        x1m = acc_m[:, :, :s]
        x2m = acc_m[:, :, s:]
        gelu_m = x1m * (0.5 + 0.5 * _erf_invsqrt2(x1m))
        parts.append((gelu_m * x2m).astype(io_dtype))

    if fv:
        two_fv = w1_ref.shape[-1]
        assert two_fv == 2 * fv, (two_fv, fv, s)
        # 1x1 expansion on the MXU (padded dims; zero rows keep padding
        # inert). The elementwise section (taps, gelu, gate) stays fp32
        # even for bf16 io: v5e's VPU has no packed-bf16 ALU, so bf16
        # elementwise re-measured 20% SLOWER (25.7 vs 21.4 ms at
        # 8x512^2x96) despite halving VMEM traffic — every bf16 op
        # unpacks/repacks around an fp32 ALU.
        hidden = jax.lax.dot_general(
            y.reshape(-1, cp), w1_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(th + 2, wp, two_fv)

        if mt_refs is not None and w % 8 == 0 and s == 0:
            hidden_ref, gated_ref = mt_refs
            hidden_ref[:] = hidden
            dw_gelu_gate_microtile(hidden_ref, gated_ref, wdw_ref, th, w, fv)
            parts.append(gated_ref[:].astype(io_dtype))
        else:
            acc = dwconv3x3_stripe(hidden, wdw_ref, th, w)

            x1 = acc[:, :, :fv]
            x2 = acc[:, :, fv:]
            # exact (erf) gelu — erf approximated in-kernel (no Mosaic
            # primitive)
            gelu = x1 * (0.5 + 0.5 * _erf_invsqrt2(x1))
            parts.append((gelu * x2).astype(io_dtype))

    gated = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return jax.lax.dot_general(
        gated.reshape(-1, fpad_total), w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(th, w, cp)


def _kernel(xb_ref, x_hbm, lnw_ref, lnb_ref, w1_ref, wdw_ref, w2_ref,
            *rest, th, w, wp, c_real, bias_free, eps, s=0):
    if s:
        w1m_ref, *rest = rest
    else:
        w1m_ref = None
    out_ref, halo_ref, sem, *extra = rest
    if s:
        yim_ref = extra[-1]
        mt_refs = extra[:-1]
    else:
        yim_ref = None
        mt_refs = extra
    i = pl.program_id(1)
    bi = pl.program_id(0)

    # the bulk stripe arrives via the auto-pipelined blocked input; only
    # the 2 halo rows are fetched manually (pipelined one program ahead)
    top, bot = fetch_row_halos(x_hbm, halo_ref, sem, bi, i, th,
                               th * pl.num_programs(1))
    xt = jnp.concatenate(
        [top, xb_ref[0], bot], axis=0
    )  # (th+2, wp, cp); channels >= c_real are zero
    xf = xt.astype(jnp.float32)

    out = ln_gdfn_stripe(
        xf, i, lnw_ref, lnb_ref, w1_ref, wdw_ref, w2_ref, xt.dtype,
        th=th, w=w, wp=wp, c_real=c_real, bias_free=bias_free, eps=eps,
        mt_refs=mt_refs if mt_refs else None, w1m_ref=w1m_ref, s=s,
        yim_ref=yim_ref,
    )
    residual = xf[1 : th + 1, 1 : w + 1, :]
    out_ref[0] = (out + residual).astype(out_ref.dtype)


def _pad_last(a: jnp.ndarray, n: int) -> jnp.ndarray:
    pad = n - a.shape[-1]
    if pad == 0:
        return a
    cfg = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return jnp.pad(a, cfg)


def fused_ln_gdfn(
    x: jnp.ndarray,
    ln_w: jnp.ndarray,
    ln_b: jnp.ndarray | None,
    w1: jnp.ndarray,
    wdw: jnp.ndarray,
    w2: jnp.ndarray,
    *,
    bias_free: bool = False,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """x + GDFN(LN(x)) fused. x: (B,H,W,C); w1: (C,2F); wdw: (3,3,2F)
    depthwise; w2: (F,C). Returns (B,H,W,C) in x.dtype.

    Returns None (caller falls back to the XLA path) if no stripe fits.
    """
    b, h, w, c = x.shape
    two_f = w1.shape[1]
    f = two_f // 2
    cp = _lanes(c)
    fpad = _lanes(f)
    s = _mxu_pairs(fpad)
    th = _pick_th(h, w, cp, 2 * fpad, s=s)
    if th is None:
        return None

    # pad W+2 to a multiple of 8 and C to a multiple of 128 for the DMA
    w_extra = (-(w + 2)) % 8
    wp = w + 2 + w_extra
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + w_extra), (0, 0)))
    xp = _pad_last(xp, cp)
    dtype = x.dtype

    if ln_b is None:
        ln_b = jnp.zeros_like(ln_w)
    lnw_p = _pad_last(ln_w, cp)
    lnb_p = _pad_last(ln_b, cp)
    # hidden padded per-half so the split at fp stays aligned; the hybrid
    # split routes the first s pairs through the im2col tap-matmul
    w1m_p, w1_p, wdw_p = _split_dw_weights(w1, wdw, c, f, cp, fpad, s)
    w2_p = jnp.pad(w2, ((0, fpad - f), (0, cp - c)))

    kern = functools.partial(
        _kernel, th=th, w=w, wp=wp, c_real=c, bias_free=bias_free, eps=eps,
        s=s,
    )
    grid = (b, h // th)
    flops = 2 * b * h * w * (c * two_f + f * c) + 18 * b * h * w * two_f
    if s:
        flops += 2 * b * h * w * 8 * cp * 2 * s  # extra tap-matmul terms
    two_fv = w1_p.shape[-1]
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, th, wp, cp), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # same x, halo rows DMA
            pl.BlockSpec((cp,), lambda *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp,), lambda *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (cp, two_fv), lambda *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, 3, two_fv), lambda *_: (0, 0, 0),
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
            (1, th, w, cp), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cp), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, wp, cp), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        + (
            [
                pltpu.VMEM((th + 2, wp, 2 * fpad), jnp.float32),
                pltpu.VMEM((th, w, fpad), jnp.float32),
            ]
            if MICROTILE and w % 8 == 0
            else []
        )
        + ([pltpu.VMEM((th, w, 9 * cp), dtype)] if s else []),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * b * h * w * cp * 2,
            transcendentals=b * h * w * f,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,  # default 16M forces tiny stripes
        ),
        interpret=interpret,
    )(xp, xp, lnw_p.astype(dtype), lnb_p.astype(dtype), w1_p.astype(dtype),
      wdw_p.astype(dtype), w2_p.astype(dtype),
      *([w1m_p.astype(dtype)] if s else []))
    return out[:, :, :, :c] if cp != c else out
