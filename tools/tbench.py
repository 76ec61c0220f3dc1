"""Training-step throughput on the real TPU.

Measures steady-state images/sec of the jitted DP train step (forward +
L1 + backward + AdamW, promptir_tpu/train/step.py) at the reference
training recipe's patch size (128^2, /root/reference/options.py:13), the
workload the reference runs as 4-GPU Lightning DDP at batch 6/GPU
(/root/reference/train.py:334-341).

Iterations are chained inside one jit and ONLY the per-step losses are
returned: returning the updated TrainState would round-trip the full
parameter+optimizer pytree (~1.3 GB for promptir) through the axon
relay every call, which measures the relay, not the chip (observed 16 s
"steps" whose device time was 0.5 s). Fencing rationale as kbench.py:
block_until_ready can return early through the relay, so the measurement
is fenced by fetching a dependent scalar.

Measured on one v5e chip (full-depth promptir, 128px batch 24 bf16):
  --remat            528 ms/step, 45.4 img/s  <- recommended training config
  --fused --remat    530 ms/step (Pallas forward; custom-VJP backward
                     remats through the conv-form XLA composition —
                     parity with plain remat, see TRAIN_BENCH.md)
  --fused            OOM at batch 24 (saves v/attn per block)
Fused and plain train at the same speed at the reference recipe; both
are exact (grad-parity-tested). Use --remat unless serving and training
share a compiled fused program.

Usage:
  python tools/tbench.py --batch 24 --size 128 --dtype bfloat16 --remat
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="promptir")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--fused", action="store_true",
                   help="fused Pallas forward (custom-VJP remat backward)")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_levels", type=int, nargs="*", default=None,
                   help="restrict remat to these U-Net levels (1..4)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatch count (lax.scan accumulation)")
    p.add_argument("--inner", type=int, default=8)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--blocks", type=int, nargs=4, default=None,
                   help="override num_blocks (e.g. 1 1 1 1 for smoke runs)")
    args = p.parse_args()

    from promptir_tpu.models import create_model
    from promptir_tpu.parallel.mesh import create_mesh
    from promptir_tpu.train.state import create_train_state
    from promptir_tpu.train.step import jit_train_step, make_train_step
    from promptir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    kw = dict(dtype=dtype)
    if args.blocks is not None:
        kw.update(num_blocks=tuple(args.blocks), num_refinement_blocks=1)
    if args.remat and args.remat_levels is not None:
        kw["remat_levels"] = tuple(args.remat_levels)
    model = create_model(
        args.model, fused_ffn=args.fused, remat=args.remat, **kw
    )
    # init through the unfused twin (identical param tree; avoids Pallas
    # compiles at the init shape)
    init_model = create_model(args.model, **kw)
    mesh = create_mesh()
    state = jax.jit(
        lambda: create_train_state(
            init_model, jax.random.PRNGKey(0),
            jnp.zeros((1, args.size, args.size, 3)),
        )
    )()
    step = make_train_step(model, grad_accum=args.grad_accum)
    del mesh  # single-chip bench; jit_train_step(step, mesh) for real runs

    rng = np.random.default_rng(0)
    batch = {
        "degraded": jnp.asarray(
            rng.uniform(size=(args.batch, args.size, args.size, 3))
            .astype(np.float32)
        ),
        "clean": jnp.asarray(
            rng.uniform(size=(args.batch, args.size, args.size, 3))
            .astype(np.float32)
        ),
        "de_type": jnp.zeros((args.batch,), jnp.int32),
    }

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain(state, batch, n):
        def body(s, _):
            s, m = step(s, batch)
            return s, m["train_loss"]

        _, losses = jax.lax.scan(body, state, None, length=n)
        return losses  # state stays on device; see module docstring

    # warmup / compile (same scan length as the timed runs -> one program)
    losses = chain(state, batch, args.inner)
    float(jnp.sum(losses))
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        losses = chain(state, batch, args.inner)
        float(jnp.sum(losses))
        times.append((time.perf_counter() - t0) / args.inner)
    sec = min(times)
    tags = ""
    if args.fused:
        tags += " fused"
    if args.remat:
        tags += " remat"
        if args.remat_levels is not None:
            tags += "[" + ",".join(map(str, args.remat_levels)) + "]"
    if args.grad_accum > 1:
        tags += f" accum={args.grad_accum}"
    print(
        f"{args.model} train bs={args.batch} {args.size}px {args.dtype}"
        f"{tags}: {sec * 1e3:.1f} ms/step  {args.batch / sec:.1f} img/s"
    )


if __name__ == "__main__":
    main()
