"""Whole-model profile attribution of the 512px forward on the real TPU.

Reuses bench.py's exact program (same model flags, batch, dtype — so the
relay's persistent compile cache hits) and wraps a few steady-state
iterations in jax.profiler.trace. Then parses the resulting
trace.json.gz events and attributes device time to model stages by
matching XLA op metadata (the flax module path survives into op names /
metadata when jax.named_scope-free, via the `source`/`op_name` fields).

Usage:
  python tools/profile_forward.py --out /tmp/prof
  python tools/profile_forward.py --parse /tmp/prof   # parse only
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import time


def run_trace(out_dir: str, iters: int = 4, batch: int = 16,
              size: int = 512) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from promptir_tpu.models import create_model
    from promptir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    BATCH, SIZE = batch, size
    model = create_model("promptir", dtype=jnp.bfloat16, fused_ffn=True)
    # params host-side (eval_shape + host RNG + device_put), exactly as
    # bench.py: zero remote compiles before the profiled forward
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
    x = jnp.asarray(rng.uniform(size=(BATCH, SIZE, SIZE, 3)).astype(np.float32))

    sync = jax.jit(jnp.sum)
    for _ in range(2):
        x = fn(params, x)
    float(sync(x))

    t0 = time.perf_counter()
    jax.profiler.start_trace(out_dir)
    for _ in range(iters):
        x = fn(params, x)
    float(sync(x))
    jax.profiler.stop_trace()
    print(f"traced {iters} iters in {time.perf_counter() - t0:.2f}s -> {out_dir}")


# stage attribution: flax module path -> bucket
STAGE_PATTERNS = [
    (re.compile(r"patch_embed"), "patch_embed"),
    (re.compile(r"encoder_level1"), "enc1 512px C48"),
    (re.compile(r"down1_2"), "down1_2"),
    (re.compile(r"encoder_level2"), "enc2 256px C96"),
    (re.compile(r"down2_3"), "down2_3"),
    (re.compile(r"encoder_level3"), "enc3 128px C192"),
    (re.compile(r"down3_4"), "down3_4"),
    (re.compile(r"latent"), "latent 64px C384"),
    (re.compile(r"prompt3"), "prompt3"),
    # reduce_* before their substrings (first match wins)
    (re.compile(r"reduce_noise_level3"), "reduce_nl3"),
    (re.compile(r"noise_level3"), "noise_level3 C704"),
    (re.compile(r"up4_3"), "up4_3"),
    (re.compile(r"reduce_chan_level3"), "reduce_ch3"),
    (re.compile(r"decoder_level3"), "dec3 128px C192"),
    (re.compile(r"prompt2"), "prompt2"),
    (re.compile(r"reduce_noise_level2"), "reduce_nl2"),
    (re.compile(r"noise_level2"), "noise_level2 C320"),
    (re.compile(r"up3_2"), "up3_2"),
    (re.compile(r"reduce_chan_level2"), "reduce_ch2"),
    (re.compile(r"decoder_level2"), "dec2 256px C96"),
    (re.compile(r"prompt1"), "prompt1"),
    (re.compile(r"reduce_noise_level1"), "reduce_nl1"),
    (re.compile(r"noise_level1"), "noise_level1 C160"),
    (re.compile(r"up2_1"), "up2_1"),
    (re.compile(r"decoder_level1"), "dec1 512px C96"),
    (re.compile(r"refinement"), "refine 512px C96"),
    (re.compile(r"output"), "output"),
]


def bucket_of(name: str) -> str:
    for pat, bucket in STAGE_PATTERNS:
        if pat.search(name):
            return bucket
    return "(other)"


def parse(out_dir: str) -> None:
    paths = sorted(
        glob.glob(
            os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz")
        ),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {out_dir}")
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device-side complete events live on TPU pids; find pids whose process
    # name mentions TPU / device XLA ops
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid
        for pid, n in pid_names.items()
        if ("TPU" in n or "/device" in n.lower() or "XLA Op" in n)
    }

    by_bucket = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    n_ev = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        if device_pids and pid not in device_pids:
            continue
        dur = e.get("dur", 0)  # microseconds
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        long_name = args.get("long_name", "") or args.get("name", "")
        key = f"{name} {long_name}"
        b = bucket_of(key)
        by_bucket[b] += dur
        by_op[name.split(".")[0]] += dur
        total += dur
        n_ev += 1

    if not device_pids:
        print("WARNING: no device pid identified; attributing all X events")
        print("process names seen:", dict(list(pid_names.items())[:20]))
    print(f"{n_ev} events, total device-attributed time {total/1e3:.2f} ms")
    print("\n== by stage ==")
    for b, us in by_bucket.most_common():
        print(f"{us/1e3:10.2f} ms  {100*us/max(total,1):5.1f}%  {b}")
    print("\n== top raw ops ==")
    for op, us in by_op.most_common(25):
        print(f"{us/1e3:10.2f} ms  {100*us/max(total,1):5.1f}%  {op}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/prof")
    ap.add_argument("--parse", default=None)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=512,
                    help="input size (256 profiles bench.py's 256px line)")
    args = ap.parse_args()
    if args.parse:
        parse(args.parse)
    else:
        run_trace(args.out, args.iters, args.batch, args.size)
        parse(args.out)
