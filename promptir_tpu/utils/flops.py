"""Model complexity accounting: params, FLOPs, activations.

Capability parity with /root/reference/utils_modelsummary.py (hook-based
counters) and the per-block `compute_flops` methods: here the numbers come
from XLA itself — `jit(...).lower().compile().cost_analysis()` gives the
compiler's FLOP/byte counts for the *actual* fused program, which is more
truthful than op-by-op hand counts.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def model_cost(
    model,
    input_shape: Tuple[int, ...] = (1, 64, 64, 3),
    dtype=jnp.float32,
    **apply_kwargs,
) -> Dict[str, Any]:
    """Compile the forward at `input_shape` and report XLA cost analysis.

    Returns {"params", "flops", "bytes_accessed", "peak_memory_mb"} (fields
    absent from the backend's analysis are None).
    """
    x = jnp.zeros(input_shape, dtype)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    params_n = count_params(variables)

    def fwd(v, x):
        return model.apply(v, x, **apply_kwargs)

    variables_z = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    compiled = jax.jit(fwd).lower(variables_z, x).compile()
    ca = compiled.cost_analysis() or {}
    mem = compiled.memory_analysis()
    peak = None
    if mem is not None:
        try:
            peak = (
                mem.temp_size_in_bytes + mem.argument_size_in_bytes
            ) / 1e6
        except Exception:
            peak = None
    return {
        "params": params_n,
        "flops": ca.get("flops"),
        "bytes_accessed": ca.get("bytes accessed", ca.get("bytes_accessed")),
        "peak_memory_mb": peak,
    }


def summarize(model, input_shape=(1, 64, 64, 3), **apply_kwargs) -> str:
    """Human-readable summary (reference __main__ smoke-block style)."""
    c = model_cost(model, input_shape, **apply_kwargs)
    lines = [f"#Params : {c['params'] / 1e6:.4f} M"]
    if c["flops"]:
        lines.append(f"FLOPs  : {c['flops'] / 1e9:.4f} G @ {input_shape}")
    if c["bytes_accessed"]:
        lines.append(f"Bytes  : {c['bytes_accessed'] / 1e9:.4f} GB")
    if c["peak_memory_mb"]:
        lines.append(f"Memory : {c['peak_memory_mb']:.1f} MB")
    return "\n".join(lines)
