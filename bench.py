"""Benchmark: 512px restoration throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N,
   "mfu": N, "ms_per_iter": N}

The JSON line is printed and flushed IMMEDIATELY after the primary 512px
measurement completes — nothing else (no extra shapes, no secondary
benchmarks) runs before it, so one slow relay compile cannot starve the
driver of the number (round-2 lesson: BENCH_r02 timed out because three
fresh shapes cold-compiled before any output).

Measures steady-state megapixels/sec/chip of full-depth PromptIR
(decoder=True, 35.59M params, bfloat16 compute) restoring 512x512 inputs
(batch 16 — measured +2% over batch 8; per-call overheads amortize) —
the workload class the reference handles with serial batch-1 128px tiling
on GPU (/root/reference/demo.py:26-48).

Auditable units in the line:
  - ms_per_iter: wall ms per batch-16 512px forward (4.194 MP per iter).
  - mfu: model FLOP utilization = achieved FLOP/s over the v5e chip's
    197 bf16 TFLOP/s peak, using the reference's own FLOP counter for
    the model cost (9.8838 GMAC at 64px = 2413 GMAC per megapixel,
    counted with /root/reference utils_modelsummary.get_model_flops).

vs_baseline divides by A100_REF_MPS, an analytic estimate of the reference
PyTorch pipeline on one A100: the reference runs eager fp32 inference
(no AMP anywhere in its eval paths), batch-1 tiles of 128px with overlap 32
(stride 96 -> 25 tiles per 512px image = 1.56x redundant compute).
PromptIR forward costs 2413 GMAC per output megapixel before the 1.56x
tiling overhead. A100 fp32 (TF32 matmul) at an optimistic 35% end-to-end
utilization of 156 TFLOP/s sustains
  156e12 * 0.35 / (2 * 2413e9 * 1.56) = ~7.3 MP/s.
A100_REF_MPS = 7.3.  See BASELINE.md "Anchor audit" for the sensitivity
of this anchor to the assumed utilization (35% is generous to the
reference; measured eager batch-1 GPU inference typically lands far lower).

vs_floor divides by FLOOR_MPS = 6.4, the single-chip physics floor of this
architecture on v5e (PROFILE.md "Floor statement"); BASELINE.md "Goal of
record" states the policy: single-chip goal is vs_floor -> 1.0, the 4x-A100
north star is a multi-chip scaling target.

Env knobs (all optional, defaults chosen for the driver):
  PROMPTIR_BENCH_256=0   skip the secondary 256px batch-64 line (it runs by
                         default AFTER the primary line is out).
  PROMPTIR_BENCH_ITERS   timed iterations (default 8).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REF_MPS = 7.3
# Single-chip physics floor of this architecture on v5e (PROFILE.md "Floor
# statement": calibrated VPU pass-count model, 640-660 ms/iter ~ 6.3-6.5 MP/s;
# midpoint 6.4). The goal of record single-chip is vs_floor -> 1.0; the
# original 4x-A100 north star is reserved for multi-chip scaling
# (BASELINE.md "Goal of record").
FLOOR_MPS = 6.4
# 256px batch-64 floor: same per-pixel pass counts, but per-stripe fixed
# costs amortize over half the row width — measured block-kernel ratio
# 661.9/685.8 ms/iter at equal MP/iter (PROFILE.md "Per-resolution floor")
FLOOR_MPS_256 = 6.18
V5E_BF16_TFLOPS = 197.0  # peak bf16 TFLOP/s of one v5e chip
GMAC_PER_MP = 2413.0  # reference-counted model cost per output megapixel
SIZE = 512
BATCH = 16
WARMUP = 2
ITERS = int(os.environ.get("PROMPTIR_BENCH_ITERS", "8"))
# optional second size per BASELINE.md's metric line ("256/512px tiles");
# same pixel count per call so per-dispatch overhead stays comparable
SIZE2 = 256
BATCH2 = 64


def main():
    from promptir_tpu.models import create_model
    from promptir_tpu.utils.compile_cache import enable_persistent_cache

    # executables persist across processes (the relay's remote compile of a
    # fresh shape takes minutes; a warm run starts in seconds)
    enable_persistent_cache()

    model = create_model("promptir", dtype=jnp.bfloat16, fused_ffn=True)
    # Params via eval_shape + host RNG + one device_put per leaf: ZERO
    # remote compiles before the forward (a jitted on-device init was one
    # more multi-minute relay compile in front of the primary line; the
    # weights' values don't affect throughput, only their shapes/dtypes do)
    init_model = create_model("promptir", dtype=jnp.bfloat16, fused_ffn=False)
    shapes = jax.eval_shape(
        lambda: init_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )["params"]
    host_rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jax.device_put(
            (0.02 * host_rng.standard_normal(s.shape)).astype(s.dtype)
        ),
        shapes,
    )

    @jax.jit
    def fn(p, x):
        return jnp.clip(model.apply({"params": p}, x), 0.0, 1.0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(size=(BATCH, SIZE, SIZE, 3)).astype(np.float32)
    )

    @jax.jit
    def reduce_scalar(x):
        return jnp.sum(x)

    def sync(x):
        # On tunneled TPU backends block_until_ready can return before the
        # computation finishes; fetching a dependent scalar is a true
        # end-to-end fence (and transfers only 4 bytes).
        return float(reduce_scalar(x))

    for _ in range(WARMUP):
        x = fn(params, x)
    sync(x)

    # chain iterations (output feeds the next input) so no execution can be
    # elided between the timing fences
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x = fn(params, x)
    sync(x)
    dt = time.perf_counter() - t0

    mp_per_iter = BATCH * SIZE * SIZE / 1e6
    mps = mp_per_iter * ITERS / dt
    mfu = mps * 2.0 * GMAC_PER_MP * 1e9 / (V5E_BF16_TFLOPS * 1e12)

    # THE driver line — out the door before anything optional runs
    print(
        json.dumps(
            {
                "metric": "promptir_512px_inference_throughput_per_chip",
                "value": round(mps, 3),
                "unit": "MP/s",
                "vs_baseline": round(mps / A100_REF_MPS, 3),
                "vs_floor": round(mps / FLOOR_MPS, 3),
                "mfu": round(mfu, 4),
                "ms_per_iter": round(dt / ITERS * 1e3, 2),
            }
        ),
        flush=True,
    )

    if os.environ.get("PROMPTIR_BENCH_256", "1") == "0":
        return

    # 256px line (BASELINE.md: "256/512px tiles"), default ON since round 4
    # (round-3 verdict item 7) — a separate JSON line AFTER the primary so
    # it can never delay the driver parse (PROMPTIR_BENCH_256=0 disables)
    x2 = jnp.asarray(
        rng.uniform(size=(BATCH2, SIZE2, SIZE2, 3)).astype(np.float32)
    )
    for _ in range(WARMUP):
        x2 = fn(params, x2)
    sync(x2)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x2 = fn(params, x2)
    sync(x2)
    mps256 = BATCH2 * SIZE2 * SIZE2 * ITERS / 1e6 / (time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": "promptir_256px_inference_throughput_per_chip",
                "value": round(mps256, 3),
                "unit": "MP/s",
                "vs_baseline": round(mps256 / A100_REF_MPS, 3),
                "vs_floor": round(mps256 / FLOOR_MPS_256, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
