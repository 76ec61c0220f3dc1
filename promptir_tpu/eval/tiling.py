"""Tiled arbitrary-resolution inference, compiled end-to-end.

Behavioral parity: /root/reference/demo.py:26-48 — slide a `tile`-sized
window with `tile - overlap` stride (last row/col snapped to the image
edge), run the model per tile, accumulate outputs E and a count mask W,
return clamp(E / W, 0, 1).

TPU-first redesign: the reference loops tiles serially with batch 1. Here
all tile positions for a given (H, W, tile, overlap) are static, so we
  1. gather every tile into one (N, tile, tile, C) batch,
  2. run the model over fixed-size tile chunks (static shapes -> one
     compile; vmap-free batched forward saturates the MXU),
  3. scatter-add results and counts in-graph with a `lax.scan` of
     `dynamic_update_slice` adds.
Arbitrary resolutions reuse compiled code via shape bucketing: the input is
reflect-padded up to the next multiple of `bucket` before tiling.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from promptir_tpu.eval.padding import pad_to_multiple_reflect


def tile_positions(size: int, tile: int, stride: int) -> list[int]:
    """Reference position list: range(0, size - tile, stride) + [size-tile]."""
    if size <= tile:
        return [0]
    pos = list(range(0, size - tile, stride))
    pos.append(size - tile)
    return pos


@functools.partial(
    jax.jit, static_argnums=(0, 3, 4, 5, 6)
)
def _tiled_forward(
    model_fn: Callable,
    params,
    x: jnp.ndarray,
    tile: int,
    overlap: int,
    chunk: int,
    mesh=None,
):
    b, h, w, c = x.shape
    stride = tile - overlap
    hs = tile_positions(h, tile, stride)
    ws = tile_positions(w, tile, stride)
    coords = np.array([(i, j) for i in hs for j in ws], dtype=np.int32)
    n = len(coords)
    # pad tile batch to a multiple of chunk so the model sees one shape
    n_pad = (n + chunk - 1) // chunk * chunk
    coords = np.concatenate(
        [coords, np.zeros((n_pad - n, 2), np.int32)], axis=0
    )
    coords_j = jnp.asarray(coords)

    def gather(idx):
        i, j = idx[0], idx[1]
        return jax.lax.dynamic_slice(x, (0, i, j, 0), (b, tile, tile, c))

    tiles = jax.vmap(gather)(coords_j)  # (n_pad, b, tile, tile, c)
    tiles = tiles.reshape(n_pad * b, tile, tile, c)

    shard = rep = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())

    outs = []
    for s in range(0, n_pad * b, chunk * b):
        chunk_in = tiles[s : s + chunk * b]
        if shard is not None:
            # tile-batch data parallelism: each device forwards its slice
            # of the tile batch (multi-chip single-image scaling)
            chunk_in = jax.lax.with_sharding_constraint(chunk_in, shard)
        outs.append(model_fn(params, chunk_in))
    outs = jnp.concatenate(outs, axis=0).reshape(n_pad, b, tile, tile, c)
    if rep is not None:
        # the blend scan is sequential; run it replicated on every device
        outs = jax.lax.with_sharding_constraint(outs, rep)

    acc = jnp.zeros((b, h, w, c), jnp.float32)
    cnt = jnp.zeros((b, h, w, 1), jnp.float32)
    ones = jnp.ones((b, tile, tile, 1), jnp.float32)

    def body(carry, inp):
        acc, cnt = carry
        idx, out, valid = inp
        i, j = idx[0], idx[1]
        patch = jax.lax.dynamic_slice(acc, (0, i, j, 0), (b, tile, tile, c))
        acc = jax.lax.dynamic_update_slice(
            acc, patch + out * valid, (0, i, j, 0)
        )
        cpatch = jax.lax.dynamic_slice(cnt, (0, i, j, 0), (b, tile, tile, 1))
        cnt = jax.lax.dynamic_update_slice(
            cnt, cpatch + ones * valid, (0, i, j, 0)
        )
        return (acc, cnt), None

    valid = (jnp.arange(n_pad) < n).astype(jnp.float32)[:, None, None, None]
    (acc, cnt), _ = jax.lax.scan(
        body, (acc, cnt), (coords_j, outs.astype(jnp.float32), valid)
    )
    return jnp.clip(acc / cnt, 0.0, 1.0)


def tiled_inference(
    model_fn: Callable,
    params,
    x: jnp.ndarray,
    tile: int = 128,
    overlap: int = 32,
    chunk: int = 8,
    bucket: int = 64,
    mesh=None,
) -> jnp.ndarray:
    """Run `model_fn(params, batch)` over overlapping tiles of NHWC `x`.

    `chunk` tiles are batched per forward; `bucket` controls shape
    bucketing (inputs are reflect-padded to a multiple, so recompiles only
    happen per bucket, not per resolution).

    With `mesh`, the tile batch is sharded over the mesh's `data` axis
    (params replicated): one oversized image is restored by all chips in
    parallel, bitwise-identical to the single-chip result. This is the
    throughput-oriented multi-chip path; `parallel/halo.py` is the
    seam-exact alternative.
    """
    _, h, w, _ = x.shape
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in ("data",)]))
        chunk = max(1, (chunk + n_dev - 1) // n_dev) * n_dev
    if h <= tile and w <= tile:
        # small image: single padded forward
        xp = pad_to_multiple_reflect(x, bucket)
        y = model_fn(params, xp)
        return jnp.clip(y[:, :h, :w, :], 0.0, 1.0)
    xp = pad_to_multiple_reflect(x, bucket)
    y = _tiled_forward(model_fn, params, xp, tile, overlap, chunk, mesh)
    return y[:, :h, :w, :]
