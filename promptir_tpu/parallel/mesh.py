"""Device mesh and sharding layout.

The reference's only distribution strategy is single-node DDP over 4 GPUs
with NCCL all-reduce (/root/reference/train.py:339). The TPU-native
equivalent is a `jax.sharding.Mesh` with a `data` axis: the batch is
sharded over `data`, parameters are replicated, and XLA inserts the
gradient `psum` over ICI automatically when the jitted train step consumes
sharded batches and emits replicated parameter updates.

A second optional `model` axis is laid out here for tensor-parallel
sharding of the channel dimension in the largest blocks (not required for
reference parity; used by the spatial/halo engine and future TP).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh; defaults to all devices on `data`."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batches sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """Shard the H axis of an NHWC image over a mesh axis (used by the
    halo-exchange engine for single-image multi-chip inference)."""
    return NamedSharding(mesh, P(None, axis))
