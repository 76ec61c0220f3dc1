"""On-chip compile sweep of the fused forward over the serve size grid.

The round-4 lesson: the first serve-shaped workload (224px input ->
28px latent) hit a Mosaic sublane-alignment constraint that no unit
test had seen, because every committed benchmark ran 256/512px. This
tool compiles AND executes the fused PromptIR forward at each size in
the product surface's grid (reference demo.py:17-24 pads arbitrary
inputs to 8-multiples; sizes here are that surface's equivalence
classes at the U-Net's four level widths), so the next alignment
constraint surfaces in a 5-minute sweep, not at round end.

Reduced depth by default: block COUNT adds no new kernel shapes (the
Pallas kernels are per-block; their shapes depend only on (H, W, C)),
but counts >1 are kept where chaining/seam fusion needs n > 1 so the
padded-chain entries/exits and decoder seams all engage exactly as in
the full model.

Usage:
  python tools/shape_sweep.py                    # default grid
  python tools/shape_sweep.py --sizes 224 320    # subset
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

DEFAULT_GRID = [
    (192, 192), (224, 224), (288, 288), (320, 320), (384, 384), (448, 448),
    (224, 320), (192, 448),  # odd-ish aspect ratios
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="*", default=None,
                   help="square sizes overriding the default grid")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--full", action="store_true",
                   help="full-depth model (slower compiles, same kernels)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from promptir_tpu.models import create_model
    from promptir_tpu.ops.pallas.autodiff import block_fits
    from promptir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    grid = [(s, s) for s in args.sizes] if args.sizes else DEFAULT_GRID

    kw = dict(dtype=jnp.bfloat16, fused_ffn=True)
    if not args.full:
        kw.update(num_blocks=(2, 2, 2, 2), num_refinement_blocks=1)
    model = create_model("promptir", **kw)
    init_model = create_model(
        "promptir", **{k: v for k, v in kw.items() if k != "fused_ffn"}
    )
    shapes = jax.eval_shape(
        lambda: init_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )
    )["params"]
    host = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jax.device_put(
            (0.02 * host.standard_normal(s.shape)).astype(s.dtype)
        ),
        shapes,
    )

    @jax.jit
    def fn(p, x):
        return jnp.clip(model.apply({"params": p}, x), 0.0, 1.0)

    results = []
    for h, w in grid:
        x = jnp.asarray(
            np.random.default_rng(h + w).uniform(
                size=(args.batch, h, w, 3)
            ).astype(np.float32)
        )
        # which levels will run fused at this size (picker verdicts)
        fused_levels = [
            lvl for lvl, (lh, lw, c, hd) in enumerate(
                [(h, w, 48, 1), (h // 2, w // 2, 96, 2),
                 (h // 4, w // 4, 192, 4), (h // 8, w // 8, 384, 8)], 1
            )
            if block_fits(lh, lw, c, 2 * int(c * 2.66), hd)
        ]
        t0 = time.perf_counter()
        try:
            out = fn(params, x)
            out.block_until_ready()
            finite = bool(jnp.isfinite(out).all())
            line = {
                "size": [h, w], "ok": bool(finite),
                "fused_levels": fused_levels,
                "compile_s": round(time.perf_counter() - t0, 1),
            }
            if not finite:
                line["error"] = "non-finite output"
        except Exception as e:  # compile or runtime failure: record, go on
            line = {
                "size": [h, w], "ok": False, "fused_levels": fused_levels,
                "error": repr(e)[:300],
            }
        results.append(line)
        print(json.dumps(line), flush=True)

    n_bad = sum(not r["ok"] for r in results)
    print(json.dumps({"sweep": len(results), "failures": n_bad}), flush=True)
    if n_bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
