"""Profile attribution of the training step on the real TPU.

Same trace-parse machinery as profile_forward.py, but around the jitted
DP train step (forward + L1 + backward + AdamW) at the reference training
recipe (128px patches, /root/reference/options.py:13). Used to find where
`--fused --remat` spends its time vs plain `--remat`
(TRAIN_BENCH.md: 925 vs 528 ms/step at batch 24).

Usage:
  python tools/profile_train.py --out /tmp/tprof --fused --remat
  python tools/profile_train.py --parse /tmp/tprof   # parse only
"""

from __future__ import annotations

import argparse
import time


def run_trace(out_dir: str, args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from promptir_tpu.models import create_model
    from promptir_tpu.train.state import create_train_state
    from promptir_tpu.train.step import make_train_step
    from promptir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.bfloat16
    model = create_model(
        "promptir", dtype=dtype, fused_ffn=args.fused, remat=args.remat
    )
    init_model = create_model("promptir", dtype=dtype)
    state = jax.jit(
        lambda: create_train_state(
            init_model, jax.random.PRNGKey(0),
            jnp.zeros((1, args.size, args.size, 3)),
        )
    )()
    step = make_train_step(model)

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
        return losses

    losses = chain(state, batch, args.iters)
    float(jnp.sum(losses))  # fence (relay: block_until_ready returns early)

    t0 = time.perf_counter()
    jax.profiler.start_trace(out_dir)
    losses = chain(state, batch, args.iters)
    float(jnp.sum(losses))
    jax.profiler.stop_trace()
    print(
        f"traced {args.iters} steps in {time.perf_counter() - t0:.2f}s "
        f"-> {out_dir}"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tprof")
    ap.add_argument("--parse", default=None)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    from profile_forward import parse

    if args.parse:
        parse(args.parse)
    else:
        run_trace(args.out, args)
        parse(args.out)
