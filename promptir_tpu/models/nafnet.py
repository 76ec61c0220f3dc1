"""NAFNet — the Simple Baselines U-Net (FLOPs-comparison baseline).

Parity target: /root/reference/net/nafnet.py:85-174: plain conv U-Net of
NAFBlocks; 2x2/s2 conv downs, 1x1-conv + pixel-shuffle ups with *additive*
skips; pads input to a multiple of 2^len(encoders) and crops back.
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
                x = NAFBlock(chan, dtype=self.dtype,
                             name=f"encoders_{li}_{bi}")(x)
            encs.append(x)
            x = Conv(2 * chan, (2, 2), strides=(2, 2), use_bias=True,
                     dtype=self.dtype, name=f"downs_{li}")(x)
            chan *= 2

        for bi in range(self.middle_blk_num):
            x = NAFBlock(chan, dtype=self.dtype, name=f"middle_blks_{bi}")(x)

        for li, num in enumerate(self.dec_blk_nums):
            x = Conv(2 * chan, (1, 1), use_bias=False, dtype=self.dtype,
                     name=f"ups_{li}_0")(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + encs[-(li + 1)]
            for bi in range(num):
                x = NAFBlock(chan, dtype=self.dtype,
                             name=f"decoders_{li}_{bi}")(x)

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
