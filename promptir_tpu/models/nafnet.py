"""NAFNet — the Simple Baselines U-Net (FLOPs-comparison baseline).

Parity target: /root/reference/net/nafnet.py:85-174: plain conv U-Net of
NAFBlocks; 2x2/s2 conv downs, 1x1-conv + pixel-shuffle ups with *additive*
skips; pads input to a multiple of 2^len(encoders) and crops back.

`tlc_base` enables NAFNetLocal (nafnet.py:156-174): TLC swaps each SCA
global pool for a local average pool whose kernel is fixed during the
convert dry-run at the *train-time* feature size of that pool's depth —
`base / 2^level` — and never rescaled at test time.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.models import register_model
from promptir_tpu.ops.conv import Conv
from promptir_tpu.ops.easy import NAFBlock
from promptir_tpu.ops.resample import pixel_shuffle


class NAFNet(nn.Module):
    img_channel: int = 3
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    dtype: jnp.dtype = jnp.float32
    # TLC (NAFNetLocal): per-level local-pool SCA kernels; same param tree.
    tlc_base: "tuple | None" = None

    def _blk(self, chan: int, level: int, name: str) -> NAFBlock:
        kernel = None
        if self.tlc_base is not None:
            kernel = (
                max(1, self.tlc_base[0] // 2**level),
                max(1, self.tlc_base[1] // 2**level),
            )
        return NAFBlock(chan, dtype=self.dtype, tlc_kernel=kernel, name=name)

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = inp.shape
        pad = 2 ** len(self.enc_blk_nums)
        ph = (pad - h % pad) % pad
        pw = (pad - w % pad) % pad
        x_in = jnp.pad(inp, ((0, 0), (0, ph), (0, pw), (0, 0)))

        x = Conv(self.width, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                 dtype=self.dtype, name="intro")(x_in.astype(self.dtype))

        encs = []
        chan = self.width
        for li, num in enumerate(self.enc_blk_nums):
            for bi in range(num):
                x = self._blk(chan, li, f"encoders_{li}_{bi}")(x)
            encs.append(x)
            x = Conv(2 * chan, (2, 2), strides=(2, 2), use_bias=True,
                     dtype=self.dtype, name=f"downs_{li}")(x)
            chan *= 2

        mid_level = len(self.enc_blk_nums)
        for bi in range(self.middle_blk_num):
            x = self._blk(chan, mid_level, f"middle_blks_{bi}")(x)

        for li, num in enumerate(self.dec_blk_nums):
            x = Conv(2 * chan, (1, 1), use_bias=False, dtype=self.dtype,
                     name=f"ups_{li}_0")(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + encs[-(li + 1)]
            level = mid_level - 1 - li
            for bi in range(num):
                x = self._blk(chan, level, f"decoders_{li}_{bi}")(x)

        x = Conv(self.img_channel, (3, 3), padding=((1, 1), (1, 1)),
                 use_bias=True, dtype=self.dtype, name="ending")(x)
        x = x + x_in.astype(x.dtype)
        return x[:, :h, :w, :].astype(jnp.float32)


@register_model("nafnet")
def _nafnet(**kwargs) -> NAFNet:
    kwargs.setdefault("width", 32)
    kwargs.setdefault("middle_blk_num", 12)
    kwargs.setdefault("enc_blk_nums", (2, 2, 4, 8))
    kwargs.setdefault("dec_blk_nums", (2, 2, 2, 2))
    return NAFNet(**kwargs)


@register_model("nafnetlocal")
def _nafnet_local(**kwargs) -> NAFNet:
    """NAFNetLocal: NAFNet + TLC local-pool SCA at inference
    (/root/reference/net/nafnet.py:156-174; train_size 256, base = 1.5x
    train per the TLC recipe). Same parameters as `nafnet` — trained
    NAFNet weights apply unchanged."""
    train = kwargs.pop("tlc_train_size", (256, 256))
    kwargs.setdefault("tlc_base", (int(train[0] * 1.5), int(train[1] * 1.5)))
    return _nafnet(**kwargs)
