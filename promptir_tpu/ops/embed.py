"""Overlapped patch embedding: a stride-1 3x3 conv from RGB to `dim`.

Parity target: /root/reference/net/model.py:202-211.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.ops.conv import Conv, Dense
from promptir_tpu.utils.init import torch_kernel_init


class _ProjParams(nn.Module):
    """Conv params with the same path/init as `Conv(name="proj")`."""

    shape: tuple
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param("kernel", torch_kernel_init, self.shape)
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


class OverlapPatchEmbed(nn.Module):
    embed_dim: int = 48
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, padded_out: bool = False):
        if padded_out:
            # Emit directly into the fused kernels' pad_nhwc layout
            # (B, H, wp, cp): the RGB input is column-padded (3 channels —
            # cheap) and the kernel's OUTPUT channels zero-widened to cp,
            # so the conv itself writes the lane-padded buffer and the
            # usual layout-fix copy + entry pad of the first block stack
            # (~6.5 ms at 512^2 batch 16) never materialize. The border
            # COLUMNS come out of the conv nonzero (they see real pixels)
            # and are left dirty: chain entries tolerate junk border
            # columns — both kernel passes border-mask the stripe before
            # any spatial tap (ops/pallas/gdfn.py:ln_gdfn_stripe,
            # mdta.py:stats_stripe) and re-emit true zero borders — which
            # spares the full-resolution mask-multiply pass (~3.3 ms at
            # 512^2 batch 16). Zero LANES remain load-bearing (LN divides
            # by c_real) and come from the zero-padded kernel columns.
            cp = -(-self.embed_dim // 128) * 128
            b_, h_, w_, cin = x.shape
            wp = w_ + 2 + ((-(w_ + 2)) % 8)
            k, bias = _ProjParams(
                (3, 3, cin, self.embed_dim), self.use_bias, name="proj"
            )()
            # im2col + dot rather than conv_general_dilated: XLA lowers
            # this 3-input-channel conv with batch in the sublanes
            # ({3,0,2,1} output layout) and pays a full-tensor relayout
            # copy handing the buffer to the Pallas chain entry (measured
            # conv 2.08 + copy 3.31 ms at 512^2 batch 16). The 9*cin-lane
            # im2col is tiny (RGB input), and the dot writes the row-major
            # lane-padded buffer directly — no relayout.
            xin = jnp.pad(
                x.astype(self.dtype),
                ((0, 0), (1, 1), (2, wp - w_), (0, 0)),
            )  # H pad 1 for the taps; W pad = chain left-shift 1 + tap 1
            cols = jnp.concatenate(
                [
                    xin[:, di : di + h_, dj : dj + wp, :]
                    for di in range(3)
                    for dj in range(3)
                ],
                axis=-1,
            )  # (B, H, wp, 9*cin), lane index (di*3 + dj)*cin + c
            wmat = jnp.pad(
                k.reshape(9 * cin, self.embed_dim),
                ((0, 0), (0, cp - self.embed_dim)),
            )
            y = jnp.einsum("bhwk,kd->bhwd", cols, wmat.astype(self.dtype))
            if bias is not None:
                bw = jnp.pad(bias, (0, cp - self.embed_dim))
                # bias only on real lanes; pad lanes stay zero. Border
                # columns are dirty anyway (see above), so no column mask.
                y = y + bw.astype(y.dtype)
            return y
        return Conv(
            self.embed_dim,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="proj",
        )(x)
