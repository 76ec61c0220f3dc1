"""Serving-engine benchmark on the real TPU.

Drives serve.InferenceEngine (the production analogue of the reference's
serial demo loop, /root/reference/demo.py:79-127) with concurrent
closed-loop clients at one or two padded shape buckets and reports the
numbers that matter for serving: p50/p90/p99 request latency, sustained
throughput (requests/s and MP/s), mean batch fill, and the shed/timeout
counters. Results go to SERVE_BENCH.md.

Methodology:
  * closed loop — each of --clients threads submits, waits for its
    result, and immediately submits again; the offered load is therefore
    `clients / latency`, the natural saturation measure for a
    single-device engine (an open-loop Poisson driver would only measure
    the queue, not the engine).
  * warmup phase compiles every (bucket x max_batch) program before the
    timed window (new XLA shapes remote-compile in minutes on the axon
    relay; warm shapes are milliseconds).
  * latencies are measured caller-side (submit -> result), so they
    include queueing, batching delay, padding, device time, and the
    host roundtrip — what a network handler in front of the engine
    would see.

Usage:
  python tools/sbench.py --size 224 --clients 16 --seconds 30
  python tools/sbench.py --size 224 --size2 320 --clients 16 --seconds 30
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="promptir")
    p.add_argument("--size", type=int, default=224,
                   help="primary square image size")
    p.add_argument("--size2", type=int, default=0,
                   help="optional second shape bucket (0 = single bucket)")
    p.add_argument("--mix2", type=float, default=0.25,
                   help="fraction of clients submitting size2 images")
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--batch_timeout_ms", type=float, default=5.0)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--fused", action="store_true", default=True)
    p.add_argument("--no-fused", dest="fused", action="store_false")
    p.add_argument("--blocks", type=int, nargs=4, default=None,
                   help="override num_blocks (smoke runs)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from promptir_tpu.models import create_model
    from promptir_tpu.serve.engine import InferenceEngine
    from promptir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    kw = dict(dtype=dtype, fused_ffn=args.fused)
    if args.blocks is not None:
        kw.update(num_blocks=tuple(args.blocks), num_refinement_blocks=1)
    model = create_model(args.model, **kw)
    init_model = create_model(
        args.model, **{k: v for k, v in kw.items() if k != "fused_ffn"}
    )
    # Params via eval_shape + host RNG (zero remote compiles before the
    # engine's own warmup — a jitted on-device init is one more
    # multi-minute relay compile; throughput depends on shapes, not values)
    shapes = jax.eval_shape(
        lambda: init_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), dtype)
        )
    )
    host_rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jax.device_put(
            (0.02 * host_rng.standard_normal(s.shape)).astype(s.dtype)
        ),
        shapes,
    )

    def model_fn(p, x):
        return model.apply(p, x)

    engine = InferenceEngine(
        model_fn,
        params,
        pad_base=8,
        max_batch=args.max_batch,
        batch_timeout_ms=args.batch_timeout_ms,
        max_queue=4 * args.clients + args.max_batch,
    )

    rng = np.random.default_rng(0)
    sizes = [args.size]
    if args.size2:
        sizes.append(args.size2)
    imgs = {
        s: rng.uniform(0, 1, (s, s, 3)).astype(np.float32) for s in sizes
    }

    # ---- warmup: compile every bucket at full batch ----
    t0 = time.perf_counter()
    for s in sizes:
        futs = [engine.submit(imgs[s]) for _ in range(args.max_batch)]
        for f in futs:
            r = f.result()
            assert r.shape == imgs[s].shape, (r.shape, imgs[s].shape)
    print(f"warmup (compile) took {time.perf_counter() - t0:.1f}s "
          f"for {len(sizes)} bucket(s)", flush=True)

    # ---- timed closed-loop phase ----
    lat: dict[int, list] = {s: [] for s in sizes}
    lat_lock = threading.Lock()
    stop = threading.Event()
    errors: list = []

    def client(idx: int):
        s = sizes[-1] if (args.size2 and idx < args.mix2 * args.clients) \
            else sizes[0]
        im = imgs[s]
        while not stop.is_set():
            t = time.perf_counter()
            try:
                engine.submit(im).result()
            except Exception as e:  # shed/timeout: count, keep driving
                with lat_lock:
                    errors.append(repr(e))
                time.sleep(0.005)
                continue
            dt = time.perf_counter() - t
            with lat_lock:
                lat[s].append(dt)

    base_stats = engine.stats()
    threads = [
        threading.Thread(target=client, args=(i,), daemon=True)
        for i in range(args.clients)
    ]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    elapsed = time.perf_counter() - t_start
    stats = engine.stats()
    engine.close()

    all_lat = sorted(x for v in lat.values() for x in v)
    n = len(all_lat)
    if n == 0:
        # Engine saturated / everything shed: report the failure instead
        # of crashing on an empty percentile index.
        print(json.dumps({
            "model": args.model, "buckets": sizes, "clients": args.clients,
            "seconds": round(elapsed, 2), "completed": 0,
            "errors": len(errors),
            "error_sample": errors[:3],
            "rejected": stats["rejected"] - base_stats["rejected"],
            "timed_out": stats["timed_out"] - base_stats["timed_out"],
        }), flush=True)
        raise SystemExit(1)
    mp = sum(len(v) * (s * s) for s, v in lat.items()) / 1e6
    q = lambda p: all_lat[min(n - 1, int(p * n))] * 1e3  # noqa: E731
    result = {
        "model": args.model,
        "buckets": sizes,
        "clients": args.clients,
        "max_batch": args.max_batch,
        "batch_timeout_ms": args.batch_timeout_ms,
        "seconds": round(elapsed, 2),
        "completed": n,
        "errors": len(errors),
        "req_per_s": round(n / elapsed, 2),
        "mp_per_s": round(mp / elapsed, 3),
        "latency_ms": {
            "p50": round(q(0.50), 1),
            "p90": round(q(0.90), 1),
            "p99": round(q(0.99), 1),
            "max": round(all_lat[-1] * 1e3, 1),
        },
        "per_bucket": {
            str(s): {
                "n": len(v),
                "p50_ms": round(
                    sorted(v)[len(v) // 2] * 1e3, 1
                ) if v else None,
            }
            for s, v in lat.items()
        },
        "mean_batch_fill": round(
            (
                stats["mean_batch_fill"] * stats["batches"]
                - base_stats["mean_batch_fill"] * base_stats["batches"]
            )
            / max(1, stats["batches"] - base_stats["batches"]),
            3,
        ),
        "rejected": stats["rejected"] - base_stats["rejected"],
        "timed_out": stats["timed_out"] - base_stats["timed_out"],
        "compiled_shapes": stats["compiled_shapes"],
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
