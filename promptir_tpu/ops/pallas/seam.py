"""Decoder-entry seam kernel: pixel-shuffle interleave + skip concat + pad.

The PromptIR decoder level-1 entry (reference /root/reference/net/model.py
`up2_1` + `torch.cat` + `decoder_level1`) is, in the fused chain's padded
layout, pure data movement: interleave the up-conv's four phase lanes into
2x spatial, place the encoder skip in the next c lanes, zero-pad columns
and lanes. XLA emits it as three full-resolution HBM materializations
(round-5 trace: copy.535 conv->row-major relayout 1.42 ms + copy.536
shuffle interleave 2.85 ms + pad_add_fusion 4.75 ms = 9.0 ms at 512^2
batch 16 — the largest remaining glue cluster, PROFILE.md round-5 table).
This kernel does the whole seam in ONE pass.

Mosaic constraints drove three design revisions (all probed on v5e):
  * lane->sublane unfolds compile ONLY at 128-lane granularity, so the
    kernel assembles the output in FOLDED column-pair space — pair p =
    output columns (2p, 2p+1) as a 2*cp lane vector — and does one
    aligned unfold per row phase at the end;
  * every LANE placement (up-conv phase lanes -> 0:c, skip lanes -> c:2c)
    runs as a 0/1 permutation matmul on the (otherwise idle) MXU:
    matmul results carry Mosaic's canonical vector layout, which
    tpu.concatenate demands ("offset mismatch on non-concat dimension"
    for plain shifted slices), and permutation matmuls are bit-exact in
    bf16 (each output sums exactly one unscaled input). A VMEM-scratch
    round-trip also canonicalizes, but a declared VMEM scratch wedges
    this runtime's transfer path (device stays healthy for compute, all
    host transfers hang for minutes) — measured, so: no scratch;
  * the row interleave never happens in-kernel: both the skip input and
    the output are viewed as (B, Hc, 2*wp, cp) — phase rows side by side
    along W — whose merge to (B, 2Hc, wp, cp) is a major-dim reshape XLA
    treats as a bitcast. 5D blocks also wedge the transfer path;
  * the one sublane shift (out phase j=1 reads skip pairs 1..wc) is a
    STATIC f32 slice — tpu.dynamic_rotate exists only for 32-bit data
    and its f32 form wedges the compiler here; 16-bit shifted slices
    miscarry across packed vreg boundaries, f32 ones are exact (the
    gdfn kernel's dj width-shifts use the same pattern).

Bit-exact (no arithmetic beyond multiply-by-one, only movement),
differentiable via a custom VJP whose backward is the jnp composition's
VJP (the rematerialisation pattern of ops/pallas/autodiff.py).

Layout contract (matches ops/pallas/block.py:pad_nhwc):
  yc   : (B, Hc, Wc, cin_p)  up-conv output, lane (2i+j)*c + cc for
         i,j in {0,1}, zero lanes above 4c (the conv zero-widens,
         ops/resample.py:Upsample emit_ij_padded).
  skip : (B, 2*Hc, wp, cp)   padded layout, real cols 1..2*Wc, real
         lanes 0..c (lanes >= c and cols outside may be dirty).
  out  : (B, 2*Hc, wp, cp)   out[b, 2h+i, 1+2w+j, 0:c] = yc phase (i,j),
         out[..., c:2c] = skip, zero elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from promptir_tpu.ops.pallas import gdfn as _gdfn

# Tests flip this to run the kernel in interpret mode on CPU (the model
# call sites read it at trace time, like the autodiff wrappers' interpret
# plumbing).
INTERPRET = False


def _pick_th(hc, wc, cin_p, wp, cp, vmem_budget=None):
    """Largest input-stripe height (output stripe is 2x) fitting VMEM."""
    vmem_budget = _gdfn.VMEM_BUDGET if vmem_budget is None else vmem_budget
    if (2 * wc) % 8 or wp % 8 or wp // 2 < wc + 1 or cp != 128:
        return None
    for th in (16, 8, 4, 2, 1):
        if hc % th:
            continue
        total = 2 * (
            th * wc * cin_p * 2          # yc stripe (dbl-buffered)
            + th * 2 * wp * cp * 2       # skip stripe (phases along W)
            + th * 2 * wp * cp * 2       # out stripe
        ) + 14 * th * wp * cp * 2        # assembly temps (b0/b1/low/high/zi
        #                                  x2 phases) + f32 shift detour
        if total < vmem_budget:
            return th
    return None


def _kernel(yc_ref, skip_ref, out_ref, *, th, wc, c, wp, cp):
    np2 = wp // 2
    y = yc_ref[0]  # (th, wc, cin_p)
    dt = y.dtype

    def place(v, src0, dst0):
        # v lanes [src0:src0+c] -> lanes [dst0:dst0+c] of a 128-lane
        # result, zeros elsewhere, via a 0/1 permutation matmul: the MXU
        # is idle in this kernel, the result carries Mosaic's canonical
        # vector layout (tpu.concatenate rejects shifted-slice layouts),
        # and each output lane sums exactly one unscaled input, so the
        # move is bit-exact in bf16.
        n_in = v.shape[-1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_in, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_in, 128), 1)
        p = (
            (rows == cols - dst0 + src0)
            & (cols >= dst0) & (cols < dst0 + c)
        ).astype(dt)
        return jax.lax.dot_general(
            v.reshape(th * wc, n_in), p,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt).reshape(th, wc, 128)

    for i in (0, 1):
        # folded pairs: pair p = [col 2p (cp lanes) | col 2p+1 (cp lanes)]
        skf = skip_ref[0][:, i * wp:(i + 1) * wp].reshape(th, np2, 2 * cp)
        # up phase j lands at out col 1+2w+j: j=0 -> pair w HIGH half,
        # j=1 -> pair w+1 LOW half
        sk0 = skf[:, :wc, cp:]          # 128-aligned lane slice
        # one-sublane shift, static f32 slice (see module docstring)
        sk_lo = skf[:, :, :cp]
        if sk_lo.dtype.itemsize != 4:
            sk1 = sk_lo.astype(jnp.float32)[:, 1:wc + 1].astype(dt)
        else:
            sk1 = sk_lo[:, 1:wc + 1]
        b0 = place(y, 2 * i * c, 0) + place(sk0, 0, c)
        b1 = place(y, (2 * i + 1) * c, 0) + place(sk1, 0, c)
        low = jnp.concatenate(
            [jnp.zeros((th, 1, cp), dt), b1,
             jnp.zeros((th, np2 - wc - 1, cp), dt)], axis=1
        )
        high = jnp.concatenate(
            [b0, jnp.zeros((th, np2 - wc, cp), dt)], axis=1
        )
        zi = jnp.concatenate([low, high], axis=-1)  # (th, np2, 2cp)
        out_ref[0, :, i * wp:(i + 1) * wp] = zi.reshape(th, wp, cp)


def _xla_seam(yc, skip, c, wp, cp):
    """The jnp composition (backward path + fallback + parity oracle)."""
    b, hc, wc, _ = yc.shape
    y = yc[:, :, :, :4 * c].reshape(b, hc, wc, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (b, h, i, w, j, c)
    up = y.reshape(b, 2 * hc, 2 * wc, c)
    sk = skip[:, :, 1:1 + 2 * wc, :c]
    row = jnp.concatenate([up, sk], axis=-1)
    return jnp.pad(
        row, ((0, 0), (0, 0), (1, wp - 1 - 2 * wc), (0, cp - 2 * c))
    )


def _seam_call(yc, skip4, c, th, interpret):
    b, hc, wc, cin_p = yc.shape
    _, _, wp2, cp = skip4.shape
    wp = wp2 // 2
    kern = functools.partial(
        _kernel, th=th, wc=wc, c=c, wp=wp, cp=cp
    )
    return pl.pallas_call(
        kern,
        grid=(b, hc // th),
        in_specs=[
            pl.BlockSpec(
                (1, th, wc, cin_p), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, 2 * wp, cp), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, 2 * wp, cp), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hc, 2 * wp, cp), yc.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * b * 2 * hc * wp * cp * 2
            + b * hc * wc * cin_p * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_gdfn.VMEM_LIMIT,
        ),
        interpret=interpret,
    )(yc, skip4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _seam(yc, skip, c, interpret):
    b, hc, wc, cin_p = yc.shape
    _, h2, wp, cp = skip.shape
    th = _pick_th(hc, wc, cin_p, wp, cp)
    assert th is not None  # caller pre-checked via seam_fits
    skip4 = skip.reshape(b, hc, 2 * wp, cp)     # free major-dim fold
    out4 = _seam_call(yc, skip4, c, th, interpret)
    return out4.reshape(b, h2, wp, cp)          # free major-dim merge


def _seam_fwd(yc, skip, c, interpret):
    return _seam(yc, skip, c, interpret), (yc, skip)


def _seam_bwd(c, interpret, res, g):
    yc, skip = res
    _, vjp = jax.vjp(
        lambda a, b_: _xla_seam(a, b_, c, skip.shape[2], skip.shape[3]),
        yc, skip,
    )
    return vjp(g.astype(yc.dtype))


_seam.defvjp(_seam_fwd, _seam_bwd)


def seam_fits(hc, wc, cin_p, wp, cp, interpret=False) -> bool:
    from promptir_tpu.ops.pallas.autodiff import tpu_ok

    return tpu_ok(interpret) and _pick_th(hc, wc, cin_p, wp, cp) is not None


def shuffle_concat_pad(yc, skip, c, *, interpret=False):
    """One-pass decoder-entry seam (see module docstring). Returns the
    (B, 2Hc, wp, cp) padded chain entry, or None when the shape doesn't
    fit (caller falls back to the jnp composition — same math)."""
    b, hc, wc, cin_p = yc.shape
    _, h2, wp, cp = skip.shape
    if h2 != 2 * hc or cin_p % 128 or 4 * c > cin_p or 2 * c > cp:
        return None
    if not seam_fits(hc, wc, cin_p, wp, cp, interpret):
        return None
    return _seam(yc, skip, c, interpret)
