"""PromptXRestormerEff: X-Restormer blocks + cheap channel-only prompt
interaction.

Parity targets: /root/reference/net/prompt_xrestormer_eff.py —
`ChannelTransformerBlock` (channel attn + GDFN only, :264-282) replaces the
full X-block in the prompt interaction; prompt wiring follows canonical
PromptIR (PromptGenBlock + noise_level/reduce at latent/dec3/dec2,
:460-471,490-521) including its asymmetric decoder (`up4_3 = Upsample(192)`
and `reduce_chan_level3: 96+192 -> 192`, :441-442). Registered as
`promptxrestormereffir` (/root/reference/train.py:320).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.models import register_model
from promptir_tpu.models.xrestormer import XRestormer
from promptir_tpu.ops.attention import MDTA
from promptir_tpu.ops.conv import Conv
from promptir_tpu.ops.embed import OverlapPatchEmbed
from promptir_tpu.ops.gdfn import GDFN
from promptir_tpu.ops.norm import RestormerLayerNorm
from promptir_tpu.ops.prompt import PromptGenBlock
from promptir_tpu.ops.resample import (
    Downsample,
    FewChannelConv3,
    Upsample,
)


class ChannelTransformerBlock(nn.Module):
    """Channel-attention + GDFN residual block (submodule names match the
    reference's ChannelTransformerBlock for ckpt mapping)."""

    dim: int
    num_channel_heads: int = 1
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_ffn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.fused_ffn and not self.use_bias:
            from promptir_tpu.models.blocks import fused_mdta_gdfn_block

            return fused_mdta_gdfn_block(
                x, self.dim, self.num_channel_heads,
                int(self.dim * self.expansion),
                bias_free=self.bias_free_norm, dtype=self.dtype,
                names=("norm1", "channel_attn", "norm2", "channel_ffn"),
            )
        y = RestormerLayerNorm(self.dim, self.bias_free_norm, name="norm1")(x)
        x = x + MDTA(
            self.dim, self.num_channel_heads, self.use_bias, self.dtype,
            name="channel_attn",
        )(y)
        y = RestormerLayerNorm(self.dim, self.bias_free_norm, name="norm2")(x)
        x = x + GDFN(
            self.dim, self.expansion, self.use_bias, self.dtype,
            name="channel_ffn",
        )(y)
        return x


class PromptXRestormerEff(XRestormer):
    prompt: bool = True

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
        ctb = lambda dim, name: ChannelTransformerBlock(  # noqa: E731
            dim, 1, self.expansion, self.use_bias, self.bias_free_norm,
            self.dtype, fused_ffn=self.fused_ffn, name=name,
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

        if self.prompt:
            p3 = PromptGenBlock(320, 5, 16, 8 * d, dtype=self.dtype,
                                name="prompt3")(x)
            x = jnp.concatenate([x, p3], axis=-1)
            # reference literal int(dim*4)+512 equals the actual concat
            # width 8d+320 only at its hardcoded dim=48; derive from the
            # concat (identical param tree at 48, builds at any width)
            x = ctb(8 * d + 320, "noise_level3")(x)
            x = conv1(4 * d, "reduce_noise_level3")(x)

        x = Upsample(4 * d, self.dtype, name="up4_3")(x)
        x = jnp.concatenate([x, enc3], axis=-1)
        x = conv1(4 * d, "reduce_chan_level3")(x)
        for blk in self._stack("decoder_level3", nb[2], 4 * d, 2):
            x = blk(x)

        if self.prompt:
            p2 = PromptGenBlock(128, 5, 32, 4 * d, dtype=self.dtype,
                                name="prompt2")(x)
            x = jnp.concatenate([x, p2], axis=-1)
            x = ctb(4 * d + 128, "noise_level2")(x)  # ref 2d+224 == 4d+128 at d=48 only
            x = conv1(4 * d, "reduce_noise_level2")(x)

        x = Upsample(4 * d, self.dtype, name="up3_2")(x)
        x = jnp.concatenate([x, enc2], axis=-1)
        x = conv1(2 * d, "reduce_chan_level2")(x)
        for blk in self._stack("decoder_level2", nb[1], 2 * d, 1):
            x = blk(x)

        if self.prompt:
            p1 = PromptGenBlock(64, 5, 64, 2 * d, dtype=self.dtype,
                                name="prompt1")(x)
            x = jnp.concatenate([x, p1], axis=-1)
            x = ctb(2 * d + 64, "noise_level1")(x)
            x = conv1(2 * d, "reduce_noise_level1")(x)

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


@register_model("promptxrestormereffir")
def _promptxrestormereff(**kwargs) -> PromptXRestormerEff:
    return PromptXRestormerEff(**kwargs)
