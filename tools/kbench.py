"""Microbenchmark the fused Pallas kernels on the real TPU.

Times one fused op (LN+GDFN or LN+MDTA) at a given activation shape by
chaining `--inner` iterations inside one jit (the axon relay costs ~2.8 ms
per dispatch, and block_until_ready can return early — so iterations are
scan-chained and the measurement is fenced by fetching a dependent scalar).

Usage:
  python tools/kbench.py --op gdfn --shape 4 512 512 48
  python tools/kbench.py --op mdta --shape 4 512 512 48 --ablate-gelu

`--ablate-gelu` patches the in-kernel erf to identity to isolate the
transcendental's share of runtime (gdfn only). `--ablate-dw` replaces the
9-tap depthwise conv with a single center tap to isolate the VPU tap cost
(output is numerically wrong; timing only).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_gdfn(shape, dtype):
    from promptir_tpu.ops.pallas.gdfn import fused_ln_gdfn

    b, h, w, c = shape
    f = int(c * 2.66)
    rng = np.random.default_rng(0)
    lnw = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.02 + 1)
    lnb = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.02)
    w1 = jnp.asarray(rng.normal(size=(c, 2 * f)).astype(np.float32) * 0.02)
    wdw = jnp.asarray(rng.normal(size=(3, 3, 2 * f)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(f, c)).astype(np.float32) * 0.02)

    def op(x):
        return fused_ln_gdfn(x, lnw, lnb, w1, wdw, w2)

    flops = 2 * b * h * w * (c * 2 * f + f * c) + 18 * b * h * w * 2 * f
    return op, flops


def build_mdta(shape, dtype, heads=1):
    from promptir_tpu.ops.pallas.mdta import fused_ln_mdta

    b, h, w, c = shape
    rng = np.random.default_rng(0)
    lnw = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.02 + 1)
    lnb = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.02)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32) * 0.02)
    wdw = jnp.asarray(
        rng.normal(size=(3, 3, 3 * c)).astype(np.float32) * 0.1
    )
    wproj = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.02)
    temp = jnp.ones((heads,), jnp.float32)

    def op(x):
        return fused_ln_mdta(x, lnw, lnb, wqkv, wdw, wproj, temp, heads)

    n = b * h * w
    flops = 2 * n * (c * 3 * c) + 18 * n * 3 * c + 2 * n * c * c * 2
    return op, flops


def build_stats(shape, dtype, heads=1):
    """MDTA stats pass alone (kernel A + host softmax): returns v summed
    with attn so the scan carries a chainable array."""
    from promptir_tpu.ops.pallas.mdta import mdta_stats

    b, h, w, c = shape
    rng = np.random.default_rng(0)
    lnw = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.02 + 1)
    lnb = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.02)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32) * 0.02)
    wdw = jnp.asarray(rng.normal(size=(3, 3, 3 * c)).astype(np.float32) * 0.1)
    temp = jnp.ones((heads,), jnp.float32)

    def op(x):
        v, attn = mdta_stats(x, lnw, lnb, wqkv, wdw, temp, heads)
        # fold attn into v so the chained iteration depends on both outputs
        return (v + attn[:, None, :1, :]).astype(x.dtype)[:, :, :, : x.shape[-1]]

    n = b * h * w
    flops = 2 * n * (c * 3 * c) + 18 * n * 3 * c + 2 * n * 2 * c
    return op, flops


def build_block(shape, dtype, heads=1):
    from promptir_tpu.ops.pallas.block import fused_transformer_block

    b, h, w, c = shape
    f = int(c * 2.66)
    rng = np.random.default_rng(0)
    n = lambda *s, sc=0.02: jnp.asarray(  # noqa: E731
        rng.normal(size=s).astype(np.float32) * sc
    )
    wts = (
        n(c) + 1, n(c), n(c, 3 * c), n(3, 3, 3 * c, sc=0.1), n(c, c),
        jnp.ones((heads,), jnp.float32),
    )
    gwts = (n(c) + 1, n(c), n(c, 2 * f), n(3, 3, 2 * f, sc=0.1), n(f, c))

    def op(x):
        return fused_transformer_block(x, *wts, heads, *gwts)

    npix = b * h * w
    flops = 2 * npix * (c * 3 * c + 2 * c * c + c * 2 * f + f * c)
    return op, flops


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--op", choices=["gdfn", "mdta", "block", "stats"], default="gdfn"
    )
    p.add_argument("--shape", type=int, nargs=4, default=[4, 512, 512, 48])
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--heads", type=int, default=1)
    p.add_argument("--inner", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--ablate-gelu", action="store_true")
    p.add_argument("--ablate-dw", action="store_true")
    p.add_argument("--dw-2acc", action="store_true")
    p.add_argument("--ablate-halo", action="store_true")
    args = p.parse_args()

    if args.ablate_gelu:
        import promptir_tpu.ops.pallas.gdfn as g

        g._erf_invsqrt2 = lambda x: x  # isolate the transcendental's cost

    if args.ablate_dw:
        import promptir_tpu.ops.pallas.gdfn as g

        def _center_tap(hidden, wdw_ref, th, w):
            # single center tap: isolates the 9-tap VPU cost (math wrong)
            return hidden[1 : 1 + th, 1 : 1 + w, :] * wdw_ref[1, 1, :].astype(
                jnp.float32
            )

        g.dwconv3x3_stripe = _center_tap

    if args.ablate_halo:
        import promptir_tpu.ops.pallas.gdfn as g

        def _no_halo(x_hbm, halo2_ref, sem2, bi, i, th, h_total):
            # stale scratch rows: isolates the halo DMA latency cost
            return halo2_ref[0, 0:1], halo2_ref[0, 1:2]

        g.fetch_row_halos = _no_halo

    if args.dw_2acc:
        import promptir_tpu.ops.pallas.gdfn as g

        def _two_acc(hidden, wdw_ref, th, w):
            # split the 9-FMA dependency chain into two accumulators
            accs = [None, None]
            for n, (di, dj) in enumerate(
                (di, dj) for di in range(3) for dj in range(3)
            ):
                t = hidden[di : di + th, dj : dj + w, :] * wdw_ref[
                    di, dj, :
                ].astype(jnp.float32)
                k = n % 2
                accs[k] = t if accs[k] is None else accs[k] + t
            return accs[0] + accs[1]

        g.dwconv3x3_stripe = _two_acc

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    shape = tuple(args.shape)
    if args.op == "gdfn":
        op, flops = build_gdfn(shape, dtype)
    elif args.op == "block":
        op, flops = build_block(shape, dtype, args.heads)
    elif args.op == "stats":
        op, flops = build_stats(shape, dtype, args.heads)
    else:
        op, flops = build_mdta(shape, dtype, args.heads)

    def chain(x):
        def body(x, _):
            return op(x), None

        y, _ = jax.lax.scan(body, x, None, length=args.inner)
        return y

    fn = jax.jit(chain)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, shape).astype(np.float32)
    ).astype(dtype)

    y = fn(x)
    float(jnp.sum(y))  # fence (block_until_ready lies through the relay)
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        y = fn(x)
        float(jnp.sum(y))
        times.append((time.perf_counter() - t0) / args.inner)
    ms = min(times) * 1e3
    gb = 2 * np.prod(shape) * (2 if dtype == jnp.bfloat16 else 4) / 1e9
    print(
        f"{args.op} {shape} {args.dtype}: {ms:.3f} ms/call  "
        f"{flops / (ms / 1e3) / 1e12:.2f} TFLOP/s  "
        f"{gb / (ms / 1e3):.1f} GB/s (x-read+write floor)"
    )


if __name__ == "__main__":
    main()
