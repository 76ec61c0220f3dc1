"""Conv/Dense aliases with torch-default initialization.

All framework modules use these so from-scratch training matches the
reference's initialization statistics (see utils/init.py).

`Conv` is additionally the single hook for EXACT spatially-sharded
inference (parallel/spatial.py). When a spatial-sharding trace context is
active, each conv picks the cheapest exact plan, in order:

  * stride-1 odd-kernel symmetric explicit padding: exchange `kh//2`
    boundary rows with mesh neighbors (ppermute over ICI), crop the
    recomputed edge rows — bit-identical to the unsharded zero-pad;
  * stride == kernel, no padding (patch convs): shard-local;
  * strided overlap with kh == sh + 2*ph (the Uformer 4x4/s2/p1
    downsample): ph-row halo + row-VALID strided conv — output rows
    partition exactly when the local stripe divides the stride;
  * anything else (dilation, string padding): all_gather the level's
    rows, run the full conv, keep the local slice — communication-heavy
    but never silently wrong at the seams.

None of the plans change the parameter tree.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
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
                strided = self._strided_halo_plan(x)
                if strided is not None:
                    # even-kernel strided conv with k == s + 2p (e.g. the
                    # Uformer 4x4/s2 pad-1 downsample): output rows
                    # partition exactly when the local stripe height
                    # divides the stride; each output row needs p rows of
                    # halo on both sides, then a row-VALID conv
                    return self._sharded_strided(x, axis, *strided)
                # spatially coupled with no halo plan (dilation, string
                # padding, odd strided shapes): fall back to the EXACT
                # gather -> full conv -> local slice. Communication-heavy
                # (one all_gather of the level's rows) but never silently
                # wrong at the seams.
                return self._sharded_gather(x, axis)
        return super().__call__(x)

    def _strided_halo_plan(self, x):
        """(stride_h, pad_h) when the exact strided plan applies: explicit
        symmetric padding, kh == sh + 2*ph, no dilation, local rows divide
        the stride."""
        if x.ndim != 4:
            return None
        ks = self.kernel_size
        kh = ks if isinstance(ks, int) else ks[0]
        st = self.strides
        if st is None:
            st = (1, 1)
        elif isinstance(st, int):
            st = (st, st)
        sh = st[0]
        if sh <= 1:
            return None
        pad = self.padding
        if not isinstance(pad, (tuple, list)) or len(pad) != 2:
            return None
        ph = tuple(pad[0])
        if len(ph) != 2 or ph[0] != ph[1]:
            return None
        if kh != sh + 2 * ph[0] or ph[0] == 0 or ph[0] > sh:
            return None
        if self.input_dilation not in (None, 1, (1, 1)):
            return None
        if self.kernel_dilation not in (None, 1, (1, 1)):
            return None
        if x.shape[1] % sh:
            return None
        return sh, ph[0]

    def _sharded_strided(self, x, axis, sh, ph):
        """Exchange a STRIDE-sized halo (a multiple of the stride keeps
        the module's own ((ph,ph),..) zero padding phase-aligned with the
        global conv), run the unmodified conv, and crop the one extra
        output row computed at each end. Output row q of the haloed
        stripe reads global rows  i*hl + (q-1)*sh - ph .. +kh-1  — for
        q in [1, hl/sh] exactly the unsharded outputs; border shards see
        zeros beyond row -ph only because ph <= sh."""
        from promptir_tpu.parallel.spatial import exchange_rows

        xh = exchange_rows(x, sh, axis)
        y = super().__call__(xh)
        return y[:, 1:-1]

    def _sharded_gather(self, x, axis):
        from promptir_tpu.parallel.spatial import (
            gather_rows,
            slice_local_rows,
            spatial_sharding,
        )

        xg = gather_rows(x, axis)
        with spatial_sharding(None):
            yg = super().__call__(xg)
        if yg.shape[1] % jax.lax.axis_size(axis):
            raise NotImplementedError(
                "spatial sharding: gathered conv output rows do not "
                f"partition the mesh axis (H_out={yg.shape[1]})"
            )
        return slice_local_rows(yg, axis)

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
