"""PromptXRestormer: X-Restormer U-Net with fused prompt gen+interaction.

Parity targets: /root/reference/net/prompt_xrestormer.py:322-473 —
`PromptBlock` fuses prompt generation (bilinear resize with
align_corners=True, :351), an X-TransformerBlock interaction at
lin_dim+prompt_dim channels, and a 3x3 reduce conv; the U-Net is the
*symmetric* XRestormer decoder with PromptBlocks applied after the latent
and decoder levels 3/2 (:455-466). Registered as `promptxrestormerir`
(/root/reference/train.py:316).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.models import register_model
from promptir_tpu.models.xrestormer import XRestormer, XTransformerBlock
from promptir_tpu.ops.conv import Conv


class PromptXBlock(nn.Module):
    """Prompt generation + X-block interaction + 3x3 reduce (one module)."""

    prompt_dim: int
    prompt_len: int
    prompt_size: int
    lin_dim: int
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
        b, h, w, c = x.shape
        bank = self.param(
            "prompt_param",
            nn.initializers.uniform(scale=1.0),
            (self.prompt_len, self.prompt_size, self.prompt_size, self.prompt_dim),
        )
        # this family's resize is align_corners=True
        # (/root/reference/net/prompt_xrestormer.py:351)
        from promptir_tpu.ops.prompt import (
            mix_and_resize_prompt,
            prompt_gap_weights,
        )

        weights = prompt_gap_weights(x, self.prompt_len, self.dtype)
        prompt = mix_and_resize_prompt(
            bank, weights, h, w, True, x.dtype
        )
        prompt = Conv(
            self.prompt_dim, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, name="conv3x3",
        )(prompt)

        y = jnp.concatenate([x, prompt], axis=-1)
        y = XTransformerBlock(
            dim=self.lin_dim + self.prompt_dim,
            window_size=self.window_size,
            overlap_ratio=self.overlap_ratio,
            num_channel_heads=self.num_channel_heads,
            num_spatial_heads=self.num_spatial_heads,
            spatial_dim_head=self.spatial_dim_head,
            expansion=self.expansion,
            use_bias=self.use_bias,
            bias_free_norm=self.bias_free_norm,
            dtype=self.dtype,
            fused_ffn=self.fused_ffn,
            name="attn",
        )(y)
        return Conv(
            self.lin_dim, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, name="conv",
        )(y)


class PromptXRestormer(XRestormer):
    """Symmetric XRestormer + PromptXBlocks at latent / dec3 / dec2."""

    prompt: bool = True

    def _prompt_block(self, name, prompt_dim, prompt_size, lin_dim, sp_heads):
        return PromptXBlock(
            prompt_dim=prompt_dim,
            prompt_len=5,
            prompt_size=prompt_size,
            lin_dim=lin_dim,
            window_size=8,
            overlap_ratio=0.5,
            num_channel_heads=1,
            num_spatial_heads=sp_heads,
            spatial_dim_head=self.spatial_dim_head,
            expansion=self.expansion,
            use_bias=self.use_bias,
            bias_free_norm=self.bias_free_norm,
            dtype=self.dtype,
            fused_ffn=self.fused_ffn,
            name=name,
        )

    @nn.compact
    def __call__(self, inp_img: jnp.ndarray) -> jnp.ndarray:
        from promptir_tpu.ops.embed import OverlapPatchEmbed
        from promptir_tpu.ops.resample import (
            Downsample,
            FewChannelConv3,
            Upsample,
        )

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

        if self.prompt:
            x = self._prompt_block("prompt3", 320, 16, 8 * d, 8)(x)

        x = Upsample(8 * d, self.dtype, name="up4_3")(x)
        x = jnp.concatenate([x, enc3], axis=-1)
        x = conv1(4 * d, "reduce_chan_level3")(x)
        for blk in self._stack("decoder_level3", nb[2], 4 * d, 2):
            x = blk(x)

        if self.prompt:
            x = self._prompt_block("prompt2", 128, 32, 4 * d, 4)(x)

        x = Upsample(4 * d, self.dtype, name="up3_2")(x)
        x = jnp.concatenate([x, enc2], axis=-1)
        x = conv1(2 * d, "reduce_chan_level2")(x)
        for blk in self._stack("decoder_level2", nb[1], 2 * d, 1):
            x = blk(x)

        if self.prompt:
            x = self._prompt_block("prompt1", 64, 64, 2 * d, 2)(x)

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


@register_model("promptxrestormerir")
def _promptxrestormer(**kwargs) -> PromptXRestormer:
    return PromptXRestormer(**kwargs)
