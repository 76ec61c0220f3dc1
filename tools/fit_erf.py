"""Fit the in-kernel gelu rational (ops/pallas/gdfn.py:_erf_invsqrt2).

Round-2 refit: absorb the 1/sqrt(2) gelu scale into the coefficients so
the kernel computes erf(x/sqrt(2)) directly as x * P(t)/Q(t), t = x^2,
x clamped to +-XMAX — one fewer VPU pass per gelu (each elementwise pass
over a full 512^2 batch-16 stripe costs ~0.4 ms/128 lanes; one pass saved
is ~11 ms model-wide, see PROFILE.md).

Minimax via Lawson-iterated weighted least squares on Chebyshev nodes.
Prints max |erf(x/sqrt2) - x*R(t)| and the max gelu abs error for each
candidate degree; the kernel parity budget is 2e-5.
"""

from __future__ import annotations

import numpy as np
from scipy.special import erf

XMAX = 4.2 * np.sqrt(2.0)  # erf(4.2) is within 3e-9 of 1


def fit(np_, dq, n=4000, iters=200):
    # nodes denser near 0 where curvature is high
    u = np.linspace(0, 1, n) ** 1.5
    x = u * XMAX
    t = x * x
    f = np.zeros_like(x)
    f[1:] = erf(x[1:] / np.sqrt(2.0)) / x[1:]
    f[0] = np.sqrt(2.0 / np.pi)  # limit of erf(x/sqrt2)/x

    # weight: we minimize err in erf-space => weight rows by x
    w = np.maximum(x, 1e-3)
    lw = np.ones_like(x)
    best = None
    for _ in range(iters):
        # solve  P(t) - f*Q(t) ~ 0  with Q = 1 + sum q_k t^k
        cols = [t**k for k in range(np_ + 1)]
        cols += [-f * t**k for k in range(1, dq + 1)]
        A = np.stack(cols, axis=1)
        b = f.copy()
        ww = w * np.sqrt(lw)
        sol, *_ = np.linalg.lstsq(A * ww[:, None], b * ww, rcond=None)
        p = sol[: np_ + 1]
        q = np.concatenate([[1.0], sol[np_ + 1 :]])
        num = sum(p[k] * t**k for k in range(np_ + 1))
        den = sum(q[k] * t**k for k in range(dq + 1))
        r = num / den
        err = np.abs(x * r - x * f)  # erf-space error
        lw *= np.maximum(err, 1e-12) ** 0.5
        lw /= lw.mean()
        m = err.max()
        if best is None or m < best[0]:
            best = (m, p, q)
    return best


def check_fp32(p, q):
    """fp32 Horner evaluation error incl. gelu-space error."""
    x = np.linspace(-8, 8, 2_000_001).astype(np.float32)
    u = np.clip(x, -XMAX, XMAX).astype(np.float32)
    t = (u * u).astype(np.float32)
    num = np.float32(p[-1])
    for c in p[-2::-1]:
        num = (num * t + np.float32(c)).astype(np.float32)
    den = np.float32(q[-1])
    for c in q[-2::-1]:
        den = (den * t + np.float32(c)).astype(np.float32)
    e = (u * (num / den)).astype(np.float32)
    erf_true = erf(x.astype(np.float64) / np.sqrt(2.0))
    g = (x * (np.float32(0.5) + np.float32(0.5) * e)).astype(np.float32)
    g_true = x.astype(np.float64) * 0.5 * (1.0 + erf_true)
    return np.abs(e - erf_true).max(), np.abs(g - g_true).max()


if __name__ == "__main__":
    for np_, dq in [(4, 3), (3, 3), (4, 2), (3, 2)]:
        m, p, q = fit(np_, dq)
        ee, ge = check_fp32(p, q)
        print(f"P{np_}/Q{dq}: fit64 {m:.2e}  fp32 erf {ee:.2e} gelu {ge:.2e}")
        print("  p =", list(map(float, p)))
        print("  q =", list(map(float, q[1:])))
