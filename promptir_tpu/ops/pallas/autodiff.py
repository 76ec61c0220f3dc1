"""Differentiable entry points for the fused Pallas kernels.

The fused LN+GDFN and LN+MDTA kernels (ops/pallas/gdfn.py, mdta.py) are
forward-only Pallas programs; `jax.grad` cannot flow through a
`pallas_call` without a VJP rule. These wrappers attach one:

  * forward  — the fused kernel (one HBM round-trip, fp32 tap math);
  * backward — `jax.vjp` of the mathematically identical unfused XLA
    composition, re-evaluated at the saved inputs (rematerialisation:
    nothing but the block inputs and weights is kept alive across the
    forward pass, exactly like `jax.checkpoint` would).

This makes `fused_ffn=True` legal under `jax.grad`, so training gets the
fused forward's bandwidth savings while gradients stay the exact gradients
of the reference composition (/root/reference/net/model.py:183-196). The
fused and unfused forwards agree to kernel test tolerance (~1e-5 in fp32,
below bf16 resolution), so the bwd linearisation point is consistent.

Returns None (caller falls back to plain XLA) when no row stripe of the
input fits VMEM, mirroring the raw kernels' contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from promptir_tpu.ops.norm import layernorm_nhwc
from promptir_tpu.ops.pallas import gdfn as _gdfn
from promptir_tpu.ops.pallas import mdta as _mdta


def tpu_ok(interpret: bool) -> bool:
    """The raw kernels are Mosaic TPU programs: compiling one on a CPU/GPU
    backend fails at lowering. Callers treat a None return as 'fall back
    to plain XLA', so every wrapper gates on the default backend unless
    the caller asked for interpret mode (the tests' CPU path)."""
    return interpret or jax.default_backend() == "tpu"


def _serialize_on(res, g):
    """Tie the saved residuals to the incoming cotangent with an
    optimization barrier. A block's backward recompute depends only on its
    residuals (live since the forward), so without the barrier XLA's
    scheduler hoists EVERY block's recompute ahead of the sequential dx
    chain and keeps all their hidden-grad temps alive at once — measured
    +3 GB peak HBM (OOM at batch 24/128^2) on an 8-block level-1 stack.
    The barrier makes each recompute wait for its cotangent, serializing
    block backwards exactly like the dataflow already implies."""
    flat = jax.lax.optimization_barrier((*res, g))
    return flat[:-1], flat[-1]


def _dwconv3x3(h: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3, zero padded. h: (B,H,W,F); taps: (3,3,F).

    Expressed as a grouped `lax.conv_general_dilated`, NOT as 9 shifted
    multiply-adds: this function's main job is being DIFFERENTIATED (it
    is the backward-recompute composition for the fused kernels), and the
    VJP of the 9-FMA form is ~27 separate full-tensor passes per block —
    9 tap-grad multiply+reduces, 9 input-grad FMAs and 9 pad-shift adds
    over the (B,H,W,2f) hidden (400 MB at batch 24/128^2/C96). Measured
    552 ms/step of the 922 ms fused-remat training step lived in exactly
    those fusions; the conv op's VJP lowers to XLA's fused conv-backward
    emitters instead (the same path the unfused modules' depthwise convs
    take, ops/attention.py:101-109)."""
    f = h.shape[-1]
    return jax.lax.conv_general_dilated(
        h, taps.reshape(3, 3, 1, f).astype(h.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=f,
    )


def xla_ln_gdfn(x, lnw, lnb, w1, wdw, w2, bias_free=False, eps=1e-5):
    """Unfused x + GDFN(LN(x)) — the backward-pass (and fallback) math."""
    dt = x.dtype
    y = layernorm_nhwc(x, lnw, lnb, bias_free=bias_free, eps=eps).astype(dt)
    h = jnp.einsum("bhwc,cf->bhwf", y, w1.astype(dt))
    dw = _dwconv3x3(h, wdw.astype(dt))
    a, b = jnp.split(dw, 2, axis=-1)
    g = jax.nn.gelu(a, approximate=False) * b
    return x + jnp.einsum("bhwf,fc->bhwc", g, w2.astype(dt))


def xla_ln_mdta(x, lnw, lnb, wqkv, wdw, wproj, temp, num_heads,
                bias_free=False, eps=1e-5):
    """Unfused x + MDTA(LN(x)) — the backward-pass (and fallback) math."""
    from promptir_tpu.ops.attention import channel_attention

    dt = x.dtype
    y = layernorm_nhwc(x, lnw, lnb, bias_free=bias_free, eps=eps).astype(dt)
    qkv = jnp.einsum("bhwc,cf->bhwf", y, wqkv.astype(dt))
    qkv = _dwconv3x3(qkv, wdw.astype(dt))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = channel_attention(q, k, v, temp, num_heads)
    return x + jnp.einsum("bhwc,cf->bhwf", o, wproj.astype(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _ln_gdfn(x, lnw, lnb, w1, wdw, w2, bias_free, eps, interpret):
    out = _gdfn.fused_ln_gdfn(
        x, lnw, lnb, w1, wdw, w2,
        bias_free=bias_free, eps=eps, interpret=interpret,
    )
    assert out is not None  # caller pre-checked the VMEM fit
    return out


def _ln_gdfn_fwd(x, lnw, lnb, w1, wdw, w2, bias_free, eps, interpret):
    return (
        _ln_gdfn(x, lnw, lnb, w1, wdw, w2, bias_free, eps, interpret),
        (x, lnw, lnb, w1, wdw, w2),
    )


def _ln_gdfn_bwd(bias_free, eps, interpret, res, g):
    res, g = _serialize_on(res, g)
    _, vjp = jax.vjp(
        lambda *a: xla_ln_gdfn(*a, bias_free=bias_free, eps=eps), *res
    )
    return vjp(g.astype(res[0].dtype))


_ln_gdfn.defvjp(_ln_gdfn_fwd, _ln_gdfn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _ln_mdta(x, lnw, lnb, wqkv, wdw, wproj, temp, num_heads, bias_free,
             eps, interpret):
    out = _mdta.fused_ln_mdta(
        x, lnw, lnb, wqkv, wdw, wproj, temp, num_heads,
        bias_free=bias_free, eps=eps, interpret=interpret,
    )
    assert out is not None
    return out


def _ln_mdta_fwd(x, lnw, lnb, wqkv, wdw, wproj, temp, num_heads, bias_free,
                 eps, interpret):
    return (
        _ln_mdta(x, lnw, lnb, wqkv, wdw, wproj, temp, num_heads, bias_free,
                 eps, interpret),
        (x, lnw, lnb, wqkv, wdw, wproj, temp),
    )


def _ln_mdta_bwd(num_heads, bias_free, eps, interpret, res, g):
    res, g = _serialize_on(res, g)
    _, vjp = jax.vjp(
        lambda *a: xla_ln_mdta(
            *a, num_heads, bias_free=bias_free, eps=eps
        ),
        *res,
    )
    return vjp(g.astype(res[0].dtype))


_ln_mdta.defvjp(_ln_mdta_fwd, _ln_mdta_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def _ln_block(x, ln1w, ln1b, wqkv, wdwa, wproj, temp,
              ln2w, ln2b, w1, wdwf, w2, num_heads, bias_free, eps,
              interpret):
    from promptir_tpu.ops.pallas.block import fused_transformer_block

    out = fused_transformer_block(
        x, ln1w, ln1b, wqkv, wdwa, wproj, temp, num_heads,
        ln2w, ln2b, w1, wdwf, w2,
        bias_free=bias_free, eps=eps, interpret=interpret,
    )
    assert out is not None
    return out


def _ln_block_fwd(x, ln1w, ln1b, wqkv, wdwa, wproj, temp, ln2w, ln2b, w1,
                  wdwf, w2, num_heads, bias_free, eps, interpret):
    return (
        _ln_block(x, ln1w, ln1b, wqkv, wdwa, wproj, temp, ln2w, ln2b, w1,
                  wdwf, w2, num_heads, bias_free, eps, interpret),
        (x, ln1w, ln1b, wqkv, wdwa, wproj, temp, ln2w, ln2b, w1, wdwf, w2),
    )


def _ln_block_bwd(num_heads, bias_free, eps, interpret, res, g):
    res, g = _serialize_on(res, g)

    def ref(x, ln1w, ln1b, wqkv, wdwa, wproj, temp, ln2w, ln2b, w1, wdwf,
            w2):
        x2 = xla_ln_mdta(x, ln1w, ln1b, wqkv, wdwa, wproj, temp, num_heads,
                         bias_free=bias_free, eps=eps)
        return xla_ln_gdfn(x2, ln2w, ln2b, w1, wdwf, w2,
                           bias_free=bias_free, eps=eps)

    _, vjp = jax.vjp(ref, *res)
    return vjp(g.astype(res[0].dtype))


_ln_block.defvjp(_ln_block_fwd, _ln_block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17))
def _ln_block_p(xp, ln1w, ln1b, wqkv, wdwa, wproj, temp,
                ln2w, ln2b, w1, wdwf, w2, num_heads, bias_free, eps,
                interpret, w_real, c_real):
    from promptir_tpu.ops.pallas.block import fused_transformer_block_padded

    out = fused_transformer_block_padded(
        xp, w_real, c_real, ln1w, ln1b, wqkv, wdwa, wproj, temp, num_heads,
        ln2w, ln2b, w1, wdwf, w2,
        bias_free=bias_free, eps=eps, interpret=interpret,
    )
    assert out is not None
    return out


def _ln_block_p_fwd(xp, ln1w, ln1b, wqkv, wdwa, wproj, temp, ln2w, ln2b,
                    w1, wdwf, w2, num_heads, bias_free, eps, interpret,
                    w_real, c_real):
    return (
        _ln_block_p(xp, ln1w, ln1b, wqkv, wdwa, wproj, temp, ln2w, ln2b,
                    w1, wdwf, w2, num_heads, bias_free, eps, interpret,
                    w_real, c_real),
        (xp, ln1w, ln1b, wqkv, wdwa, wproj, temp, ln2w, ln2b, w1, wdwf, w2),
    )


def _ln_block_p_bwd(num_heads, bias_free, eps, interpret, w_real, c_real,
                    res, g):
    res, g = _serialize_on(res, g)
    wp, cp = res[0].shape[2], res[0].shape[3]

    def ref(xp, ln1w, ln1b, wqkv, wdwa, wproj, temp, ln2w, ln2b, w1, wdwf,
            w2):
        x = xp[:, :, 1 : 1 + w_real, :c_real]
        x2 = xla_ln_mdta(x, ln1w, ln1b, wqkv, wdwa, wproj, temp, num_heads,
                         bias_free=bias_free, eps=eps)
        out = xla_ln_gdfn(x2, ln2w, ln2b, w1, wdwf, w2,
                          bias_free=bias_free, eps=eps)
        return jnp.pad(
            out,
            ((0, 0), (0, 0), (1, wp - 1 - w_real), (0, cp - c_real)),
        )

    _, vjp = jax.vjp(ref, *res)
    return vjp(g.astype(res[0].dtype))


_ln_block_p.defvjp(_ln_block_p_fwd, _ln_block_p_bwd)


def block_fits(h, w, c, two_f, num_heads):
    """True when the whole-block fused path (stats + tail) fits VMEM —
    the precondition for ln_block / ln_block_p / the padded chain."""
    from promptir_tpu.ops.pallas.block import _pick_th_tail

    cp = _gdfn._lanes(c)
    return (
        _mdta._pick_th(h, w, cp) is not None
        and not cp % num_heads
        and _pick_th_tail(h, w, cp, two_f) is not None
    )


def ln_block_p(xp, w, c, ln1w, ln1b, wqkv, wdwa, wproj, temp, num_heads,
               ln2w, ln2b, w1, wdwf, w2, *, bias_free=False, eps=1e-5,
               interpret=False):
    """Differentiable whole-block fusion in the padded layout (chain mode):
    xp is (B,H,wp,cp) from block.py:pad_nhwc with zero pad columns/lanes,
    and the padded layout is returned. None if no stripe fits VMEM."""
    _, h, _, _ = xp.shape
    if not tpu_ok(interpret) or not block_fits(h, w, c, w1.shape[1],
                                               num_heads):
        return None
    ln1b = jnp.zeros_like(ln1w) if ln1b is None else ln1b
    ln2b = jnp.zeros_like(ln2w) if ln2b is None else ln2b
    return _ln_block_p(xp, ln1w, ln1b, wqkv, wdwa, wproj, temp, ln2w, ln2b,
                       w1, wdwf, w2, num_heads, bias_free, eps, interpret,
                       w, c)


def ln_block(x, ln1w, ln1b, wqkv, wdwa, wproj, temp, num_heads,
             ln2w, ln2b, w1, wdwf, w2, *, bias_free=False, eps=1e-5,
             interpret=False):
    """Differentiable whole-TransformerBlock fusion (stats pass + fused
    MDTA-apply+LN+GDFN tail); None if either pass doesn't fit VMEM."""
    _, h, w, c = x.shape
    if not tpu_ok(interpret) or not block_fits(h, w, c, w1.shape[1],
                                               num_heads):
        return None
    ln1b = jnp.zeros_like(ln1w) if ln1b is None else ln1b
    ln2b = jnp.zeros_like(ln2w) if ln2b is None else ln2b
    return _ln_block(x, ln1w, ln1b, wqkv, wdwa, wproj, temp, ln2w, ln2b,
                     w1, wdwf, w2, num_heads, bias_free, eps, interpret)


def ln_gdfn(x, lnw, lnb, w1, wdw, w2, *, bias_free=False, eps=1e-5,
            interpret=False):
    """Differentiable fused x + GDFN(LN(x)); None if no stripe fits VMEM."""
    _, h, w, c = x.shape
    cp = _gdfn._lanes(c)
    fpad = _gdfn._lanes(w1.shape[1] // 2)
    if not tpu_ok(interpret) or _gdfn._pick_th(h, w, cp, 2 * fpad) is None:
        return None
    lnb = jnp.zeros_like(lnw) if lnb is None else lnb
    return _ln_gdfn(x, lnw, lnb, w1, wdw, w2, bias_free, eps, interpret)


def ln_mdta(x, lnw, lnb, wqkv, wdw, wproj, temp, num_heads, *,
            bias_free=False, eps=1e-5, interpret=False):
    """Differentiable fused x + MDTA(LN(x)); None if no stripe fits VMEM."""
    _, h, w, c = x.shape
    cp = _gdfn._lanes(c)
    if (not tpu_ok(interpret) or _mdta._pick_th(h, w, cp) is None
            or cp % num_heads):
        return None
    lnb = jnp.zeros_like(lnw) if lnb is None else lnb
    return _ln_mdta(x, lnw, lnb, wqkv, wdw, wproj, temp, num_heads,
                    bias_free, eps, interpret)
