"""Benchmark: 512px restoration throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

Measures steady-state megapixels/sec/chip of full-depth PromptIR
(decoder=True, 35.59M params, bfloat16 compute) restoring 512x512 inputs
(batch 16 — measured +2% over batch 8; per-call overheads amortize) —
the workload class the reference handles with serial batch-1 128px tiling
on GPU (/root/reference/demo.py:26-48).

vs_baseline divides by A100_REF_MPS, an analytic estimate of the reference
PyTorch pipeline on one A100: the reference runs eager fp32 inference
(no AMP anywhere in its eval paths), batch-1 tiles of 128px with overlap 32
(stride 96 -> 25 tiles per 512px image = 1.56x redundant compute).
PromptIR forward costs 9.8838 GMAC at 64px (measured with the reference's
own counter, utils_modelsummary.get_model_flops) = 2413 GMAC per output
megapixel before the 1.56x tiling overhead. A100 fp32 (TF32 matmul) at an
optimistic 35% end-to-end utilization of 156 TFLOP/s sustains
  156e12 * 0.35 / (2 * 2413e9 * 1.56) = ~7.3 MP/s.
A100_REF_MPS = 7.3.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REF_MPS = 7.3
SIZE = 512
BATCH = 16
WARMUP = 2
ITERS = 8
# second benchmark size per BASELINE.md's metric line ("256/512px tiles");
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
    # init through the unfused twin (identical param tree) under one jit:
    # eager init would dispatch hundreds of individual ops through the
    # relay, and the fused kernels would add Pallas compiles at init shape
    init_model = create_model("promptir", dtype=jnp.bfloat16, fused_ffn=False)
    params = jax.jit(init_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]

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

    megapixels = BATCH * SIZE * SIZE * ITERS / 1e6
    mps = megapixels / dt

    # 256px line (BASELINE.md: "256/512px tiles") — reported inside the
    # single JSON line so the driver's 512px parse stays unchanged
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
                "metric": "promptir_512px_inference_throughput_per_chip",
                "value": round(mps, 3),
                "unit": "MP/s",
                "vs_baseline": round(mps / A100_REF_MPS, 3),
                "mps_256px_batch64": round(mps256, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
