"""Conv/Dense aliases with torch-default initialization.

All framework modules use these so from-scratch training matches the
reference's initialization statistics (see utils/init.py).

`Conv` is additionally the single hook for EXACT spatially-sharded
inference (parallel/spatial.py): when a spatial-sharding trace context is
active, every stride-1 odd-kernel conv with symmetric explicit padding
exchanges `kh//2` boundary rows with its mesh neighbors (ppermute over
ICI) and crops the recomputed edge rows — bit-identical to the unsharded
zero-padded conv, with no change to the parameter tree.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.utils.init import torch_kernel_init


def _halo_plan(conv: nn.Conv, x) -> int:
    """Rows of halo needed for sharded execution, or 0 if the conv is not
    halo-eligible (then it must be spatially local, e.g. 1x1)."""
    if x.ndim != 4:
        return 0
    ks = conv.kernel_size
    if isinstance(ks, int):
        ks = (ks, ks)
    kh = ks[0]
    if kh <= 1 or kh % 2 == 0:
        return 0
    strides = conv.strides
    if strides not in (None, 1, (1, 1)):
        return 0
    pad = conv.padding
    if not isinstance(pad, (tuple, list)) or len(pad) != 2:
        return 0
    if tuple(pad[0]) != (kh // 2, kh // 2):
        return 0
    if conv.input_dilation not in (None, 1, (1, 1)):
        return 0
    if conv.kernel_dilation not in (None, 1, (1, 1)):
        return 0
    return kh // 2


class Conv(nn.Conv):
    """nn.Conv with torch init + spatial-sharding halo awareness."""

    kernel_init: Callable[..., Any] = torch_kernel_init

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from promptir_tpu.parallel.spatial import (
            current_spatial_axis,
            exchange_rows,
        )

        axis = current_spatial_axis()
        if axis is not None:
            halo = _halo_plan(self, x)
            if halo:
                xh = exchange_rows(x, halo, axis)
                y = super().__call__(xh)
                return y[:, halo:-halo]
            if self._nonoverlapping(x):
                # stride == kernel patch conv (e.g. NAFNet's 2x2/s2 down):
                # windows never cross stripe seams — shard-local exact
                return super().__call__(x)
            if self._h_extent() > 1:
                # spatially coupled but not halo-eligible (strided, even
                # kernel, string padding, dilation): running it per-shard
                # would be silently inexact at every stripe seam
                raise NotImplementedError(
                    "spatial sharding: no exact halo plan for Conv("
                    f"kernel_size={self.kernel_size}, strides={self.strides},"
                    f" padding={self.padding}) — only stride-1 odd-kernel "
                    "convs with symmetric explicit padding are supported"
                )
        return super().__call__(x)

    def _h_extent(self) -> int:
        ks = self.kernel_size
        return ks if isinstance(ks, int) else ks[0]

    def _nonoverlapping(self, x) -> bool:
        """stride == kernel with no effective padding and H % stride == 0:
        every window lies inside one stripe."""
        if x.ndim != 4:
            return False
        ks = self.kernel_size
        ks = (ks, ks) if isinstance(ks, int) else tuple(ks)
        st = self.strides
        if st is None:
            st = (1, 1)
        elif isinstance(st, int):
            st = (st, st)
        else:
            st = tuple(st)
        if st != ks:
            return False
        pad = self.padding
        pad_ok = pad == "VALID" or (
            isinstance(pad, (tuple, list))
            and all(tuple(p) == (0, 0) for p in pad)
        )
        # SAME == VALID when the dims divide the stride exactly
        if pad == "SAME" and x.shape[1] % ks[0] == 0 and x.shape[2] % ks[1] == 0:
            pad_ok = True
        return pad_ok and x.shape[1] % ks[0] == 0


Dense = partial(nn.Dense, kernel_init=torch_kernel_init)
ConvTranspose = partial(nn.ConvTranspose, kernel_init=torch_kernel_init)
