"""Sizing experiment: is a hand-written Pallas backward for the LN+GDFN
tail worth building? (round-4 verdict item 4)

Measures, at the reference training recipe's level-1 shape (batch 24,
128^2 patches -> C=96 blocks, /root/reference/options.py:13), one
FFN-branch residual block `x + GDFN(LN(x))`:

  fwd        forward alone
  fwd+bwd    forward + full VJP (dx + all weight grads), three ways:
    xla      plain XLA composition (what `--remat` training replays)
    remat    jax.checkpoint(xla) — the exact per-block cost inside the
             recommended training config
    fused    Pallas forward + custom-VJP backward (recompute through the
             XLA composition, ops/pallas/autodiff.py — the `--fused
             --remat` path)

and prints the bandwidth/FLOP floor of a hypothetical fully-fused Pallas
backward (one x-read + one g-read + one dx-write + weight-grad
accumulators, hidden tensors resident in VMEM) next to the measured
numbers, so the "write the kernel vs close the question" decision is a
subtraction, not a guess. Results go to PROFILE.md ("Fused-backward
sizing" entry).

Usage:
  python tools/bwd_sizing.py --shape 24 128 128 96 --inner 8 --reps 3
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth


def build(shape, dtype, variant):
    import promptir_tpu.ops.pallas.autodiff as ad

    b, h, w, c = shape
    f = int(c * 2.66)
    rng = np.random.default_rng(0)
    lnw = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.02 + 1)
    lnb = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.02)
    w1 = jnp.asarray(rng.normal(size=(c, 2 * f)).astype(np.float32) * 0.02)
    wdw = jnp.asarray(rng.normal(size=(3, 3, 2 * f)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(f, c)).astype(np.float32) * 0.02)
    wts = (lnw, lnb, w1, wdw, w2)

    if variant == "fused":
        def fwd(x):
            y = ad.ln_gdfn(x, *wts)
            assert y is not None, "shape must fit the fused kernel"
            return y
    elif variant == "remat":
        fwd = jax.checkpoint(lambda x: ad.xla_ln_gdfn(x, *wts))
    else:
        def fwd(x):
            return ad.xla_ln_gdfn(x, *wts)

    def step(x):
        # fwd+bwd with ALL grads (dx + weight grads) kept live: the
        # weight-grad sum feeds the carried x so nothing is DCE'd.
        def loss(x_, lw, lb, a, d, p):
            if variant == "fused":
                y = ad.ln_gdfn(x_, lw, lb, a, d, p)
            elif variant == "remat":
                y = jax.checkpoint(ad.xla_ln_gdfn)(x_, lw, lb, a, d, p)
            else:
                y = ad.xla_ln_gdfn(x_, lw, lb, a, d, p)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(x, *wts)
        dx = grads[0]
        wsum = sum(jnp.sum(g.astype(jnp.float32)) for g in grads[1:])
        return (x - 1e-6 * dx - 1e-12 * wsum.astype(x.dtype)).astype(x.dtype)

    return fwd, step, f


def timed(fn, x, inner, reps):
    def chain(x):
        def body(x, _):
            return fn(x).astype(x.dtype), None

        y, _ = jax.lax.scan(body, x, None, length=inner)
        return y

    cf = jax.jit(chain)
    y = cf(x)
    float(jnp.sum(y.astype(jnp.float32)))  # fence through the relay
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = cf(x)
        float(jnp.sum(y.astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / inner)
    return min(times) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", type=int, nargs=4, default=[24, 128, 128, 96])
    p.add_argument("--inner", type=int, default=8)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    shape = tuple(args.shape)
    b, h, w, c = shape
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, shape).astype(np.float32)
    ).astype(dtype)

    results = {}
    for variant in ("xla", "remat", "fused"):
        fwd, step, f = build(shape, dtype, variant)
        t_f = timed(fwd, x, args.inner, args.reps)
        t_fb = timed(step, x, args.inner, args.reps)
        results[variant] = (t_f, t_fb)
        print(
            f"{variant:6s}  fwd {t_f:7.3f} ms   fwd+bwd {t_fb:7.3f} ms   "
            f"bwd-only {t_fb - t_f:7.3f} ms",
            flush=True,
        )

    # Floor of a hypothetical fully-fused backward pass (hidden tensors
    # VMEM-resident, streamed row stripes like the forward):
    #   HBM:   read x (recompute) + read g + write dx  (+ dLN stats tiny)
    #   MXU:   recompute h=y@w1 (2*n*c*2f) + dgate@w2^T (2*n*c*f... )
    #          + dh@w1^T (2*n*2f*c) + dw1 (2*n*c*2f) + dw2 (2*n*f*c)
    #   VPU:   dw-conv taps fwd (9*2f) + transposed taps bwd (9*2f)
    #          + tap grads (9*2f) per pixel, in f32
    n = b * h * w
    bpe = 2 if dtype == jnp.bfloat16 else 4
    hbm_bytes = 3 * n * c * bpe
    mxu_flops = 2 * n * (c * 2 * f) * 2 + 2 * n * (f * c) * 3
    t_hbm = hbm_bytes / (V5E_HBM_GBPS * 1e9) * 1e3
    t_mxu = mxu_flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
    # VPU bound from the measured forward kernel: its 9-tap dw pass is
    # the dominant VPU cost; backward needs ~3x those passes (fwd-taps
    # in recompute, transposed-taps for dh, tap-grads).
    print(
        f"\nfloor of a fully-fused bwd: max(HBM {t_hbm:.3f} ms, "
        f"MXU {t_mxu:.3f} ms) + VPU tap passes (~3x the forward "
        f"kernel's dw cost)",
        flush=True,
    )
    t_gap = (results["fused"][1] - results["fused"][0]) - max(t_hbm, t_mxu)
    print(
        f"measured fused-path bwd-only minus analytic floor: "
        f"{t_gap:.3f} ms/block upper bound on what a hand-written "
        f"backward kernel could reclaim (before its own VPU cost)",
        flush=True,
    )


if __name__ == "__main__":
    main()
