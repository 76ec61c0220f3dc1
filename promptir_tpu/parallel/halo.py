"""Spatially sharded single-image inference with ICI halo exchange.

The reference handles inputs larger than one device step with host-side
serial tiling (/root/reference/demo.py:26-48). The TPU-native analogue
of "context parallelism" for images: shard the H axis of one image across
chips in a `jax.sharding.Mesh`, exchange `halo` boundary rows with mesh
neighbors over ICI (`ppermute` under `shard_map`), run the model on each
(stripe + halo) locally, and crop the halos off — one XLA program, no
host round-trips, bandwidth = 2*halo rows per chip pair instead of a full
gather.

The halo must cover the model's effective receptive field for bit-exact
equality with the unsharded forward at the seams; for U-Nets a halo of
1-2x the tile overlap used in host tiling (32-64 rows) gives the same seam
quality as the reference's overlap blending. Global image borders cannot
reproduce the unsharded zero-padding exactly — pre-pad the global image by
at least the receptive field (the eval pipeline's flip/reflect padding
already does) and crop after, so the border effect lands in padding.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def exchange_halo(
    x: jnp.ndarray, halo: int, axis_name: str, border: str = "zeros"
) -> jnp.ndarray:
    """Inside shard_map: pad a local H-stripe (B,h,W,C) with `halo` rows
    from the previous/next shard.

    `border` fills the global top/bottom: "zeros" reproduces the
    unsharded model bit-for-bit (SAME convs zero-pad), "reflect" mirrors
    the demo-style reflect padding. Returns (B, h + 2*halo, W, C).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # send top rows to the previous neighbor (they become its bottom halo)
    top = x[:, :halo]
    bot = x[:, -halo:]
    from_next = jax.lax.ppermute(
        top, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    from_prev = jax.lax.ppermute(
        bot, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    if border == "reflect":
        border_top = x[:, 1 : halo + 1][:, ::-1]
        border_bot = x[:, -halo - 1 : -1][:, ::-1]
    else:
        border_top = jnp.zeros_like(top)
        border_bot = jnp.zeros_like(bot)
    top_halo = jnp.where(idx == 0, border_top, from_prev)
    bot_halo = jnp.where(idx == n - 1, border_bot, from_next)
    return jnp.concatenate([top_halo, x, bot_halo], axis=1)


def spatial_sharded_forward(
    model_fn: Callable,
    params,
    x: jnp.ndarray,
    mesh: Mesh,
    halo: int = 32,
    axis: str = "data",
    border: str = "zeros",
) -> jnp.ndarray:
    """Run `model_fn(params, NHWC)` over an H-sharded image.

    `x` is a global (B, H, W, C) array with H divisible by the mesh axis
    size times 8 (so every stripe is conv-friendly); params are replicated.
    """
    n = mesh.shape[axis]
    _, h, w, _ = x.shape
    assert h % n == 0, f"H={h} must divide the {axis!r} axis size {n}"

    def shard_fn(params, xs):
        xp = exchange_halo(xs, halo, axis, border)
        y = model_fn(params, xp)
        return y[:, halo:-halo]

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    xg = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
    pg = jax.device_put(params, NamedSharding(mesh, P()))
    return fn(pg, xg)
