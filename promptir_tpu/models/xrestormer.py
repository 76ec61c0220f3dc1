"""X-Restormer: sequential channel-attention + spatial (OCAB) attention.

Parity targets: /root/reference/net/xrestormer.py:287-500 — the 4-norm
TransformerBlock (channel-attn -> channel-ffn -> OCAB -> spatial-ffn,
:287-327) and the symmetric-decoder U-Net assembly (:390-480; note
`up4_3 = Upsample(dim*2**3)` and `reduce_chan_level3: 384 -> 192`, unlike
canonical PromptIR). `scale > 1` prepends a bilinear upscale (:444-446).
Registered under the reference CLI name `xrestormerir`
(/root/reference/train.py:324).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.models import register_model
from promptir_tpu.ops.attention import MDTA
from promptir_tpu.ops.conv import Conv
from promptir_tpu.ops.embed import OverlapPatchEmbed
from promptir_tpu.ops.gdfn import GDFN
from promptir_tpu.ops.norm import RestormerLayerNorm
from promptir_tpu.ops.ocab import OCAB
from promptir_tpu.ops.resample import (
    Downsample,
    FewChannelConv3,
    Upsample,
)


class XTransformerBlock(nn.Module):
    """channel-attn -> channel-ffn -> spatial-attn(OCAB) -> spatial-ffn.

    `fused_ffn=True` runs the channel half through the whole-block Pallas
    fusion and the spatial FFN through the fused LN+GDFN kernel (OCAB
    itself stays on the XLA path); identical param tree either way.
    """

    dim: int
    window_size: int = 8
    overlap_ratio: float = 0.5
    num_channel_heads: int = 1
    num_spatial_heads: int = 2
    spatial_dim_head: int = 16
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_ffn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ln = lambda name: RestormerLayerNorm(  # noqa: E731
            self.dim, self.bias_free_norm, name=name
        )
        fused = self.fused_ffn and not self.use_bias
        hidden = int(self.dim * self.expansion)
        if fused:
            from promptir_tpu.models.blocks import (
                _GDFNParams,
                _LNParams,
                fused_gdfn_apply,
                fused_mdta_gdfn_block,
            )

            x = fused_mdta_gdfn_block(
                x, self.dim, self.num_channel_heads, hidden,
                bias_free=self.bias_free_norm, dtype=self.dtype,
                names=("norm1", "channel_attn", "norm2", "channel_ffn"),
            )
        else:
            x = x + MDTA(
                self.dim, self.num_channel_heads, self.use_bias, self.dtype,
                name="channel_attn",
            )(ln("norm1")(x))
            x = x + GDFN(
                self.dim, self.expansion, self.use_bias, self.dtype,
                name="channel_ffn",
            )(ln("norm2")(x))
        x = x + OCAB(
            self.dim,
            self.window_size,
            self.overlap_ratio,
            self.num_spatial_heads,
            self.spatial_dim_head,
            self.use_bias,
            self.dtype,
            name="spatial_attn",
        )(ln("norm3")(x))
        if fused:
            lnw4, lnb4 = _LNParams(
                self.dim, self.bias_free_norm, name="norm4"
            )()
            w1s, wdws, w2s = _GDFNParams(self.dim, hidden, name="spatial_ffn")()
            return fused_gdfn_apply(
                x, lnw4, lnb4, w1s, wdws, w2s,
                bias_free=self.bias_free_norm, dtype=self.dtype,
            )
        x = x + GDFN(
            self.dim, self.expansion, self.use_bias, self.dtype,
            name="spatial_ffn",
        )(ln("norm4")(x))
        return x


class XRestormer(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    channel_heads: Sequence[int] = (1, 2, 4, 8)
    spatial_heads: Sequence[int] = (2, 2, 3, 4)
    overlap_ratio: Sequence[float] = (0.5, 0.5, 0.5, 0.5)
    window_size: int = 8
    spatial_dim_head: int = 16
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_norm: bool = False
    scale: int = 1
    dtype: jnp.dtype = jnp.float32
    fused_ffn: bool = False

    def _stack(self, name: str, n: int, dim: int, level: int):
        common = dict(
            dim=dim,
            window_size=self.window_size,
            overlap_ratio=self.overlap_ratio[level],
            num_channel_heads=self.channel_heads[level],
            num_spatial_heads=self.spatial_heads[level],
            spatial_dim_head=self.spatial_dim_head,
            expansion=self.expansion,
            use_bias=self.use_bias,
            bias_free_norm=self.bias_free_norm,
            dtype=self.dtype,
            fused_ffn=self.fused_ffn,
        )
        return [
            XTransformerBlock(**common, name=f"{name}_{i}") for i in range(n)
        ]

    @nn.compact
    def __call__(self, inp_img: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        nb = self.num_blocks
        if self.scale > 1:
            from promptir_tpu.parallel.spatial import upscale_input

            inp_img = upscale_input(inp_img, self.scale)
        conv1 = lambda cout, name: Conv(  # noqa: E731
            cout, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name=name
        )

        x = OverlapPatchEmbed(d, self.use_bias, self.dtype, name="patch_embed")(
            inp_img.astype(self.dtype)
        )
        for blk in self._stack("encoder_level1", nb[0], d, 0):
            x = blk(x)
        enc1 = x
        x = Downsample(d, self.dtype, name="down1_2")(x)
        for blk in self._stack("encoder_level2", nb[1], 2 * d, 1):
            x = blk(x)
        enc2 = x
        x = Downsample(2 * d, self.dtype, name="down2_3")(x)
        for blk in self._stack("encoder_level3", nb[2], 4 * d, 2):
            x = blk(x)
        enc3 = x
        x = Downsample(4 * d, self.dtype, name="down3_4")(x)
        for blk in self._stack("latent", nb[3], 8 * d, 3):
            x = blk(x)

        x = Upsample(8 * d, self.dtype, name="up4_3")(x)
        x = jnp.concatenate([x, enc3], axis=-1)
        x = conv1(4 * d, "reduce_chan_level3")(x)
        for blk in self._stack("decoder_level3", nb[2], 4 * d, 2):
            x = blk(x)

        x = Upsample(4 * d, self.dtype, name="up3_2")(x)
        x = jnp.concatenate([x, enc2], axis=-1)
        x = conv1(2 * d, "reduce_chan_level2")(x)
        for blk in self._stack("decoder_level2", nb[1], 2 * d, 1):
            x = blk(x)

        x = Upsample(2 * d, self.dtype, name="up2_1")(x)
        x = jnp.concatenate([x, enc1], axis=-1)
        for blk in self._stack("decoder_level1", nb[0], 2 * d, 0):
            x = blk(x)
        for blk in self._stack(
            "refinement", self.num_refinement_blocks, 2 * d, 0
        ):
            x = blk(x)

        out = FewChannelConv3(
            self.out_channels, self.use_bias, self.dtype, name="output"
        )(x)
        return (out + inp_img.astype(out.dtype)).astype(jnp.float32)


@register_model("xrestormerir")
def _xrestormer(**kwargs) -> XRestormer:
    return XRestormer(**kwargs)
