"""Canonical PromptIR: 4-level Restormer U-Net + degradation prompt bank.

Behavioral parity with /root/reference/net/model.py:244-380, including its
quirks, so the released checkpoint maps 1:1:
  * asymmetric decoder: `up4_3 = Upsample(192)` (not 384) and
    `reduce_chan_level3: 96+192 -> 192` (model.py:293-294);
  * decoder level 1 runs at 96 channels with NO reduce after up2_1
    (model.py:310-316);
  * prompts (dim 64/128/320, len 5, size 64/32/16) injected after the
    latent and decoder levels 3/2 via a widened TransformerBlock + 1x1
    reduce (model.py:265-268,295-313,339-367);
  * `noise_level{3,2,1}` all use heads[2]=4 (model.py:295,304,312);
  * dead layers chnl_reduce{1,2,3} / reduce_noise_channel_{1,2,3} exist in
    the param tree but are never applied (model.py:271-287);
  * global residual: output conv + input image (model.py:377).

Layout: NHWC. Sequential stacks are named `<stack>_<i>` (torch key
`<stack>.<i>.*`); the compat converter handles the separator.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.models import register_model
from promptir_tpu.models.blocks import (
    DeadConv,
    TransformerBlock,
    apply_block_stack,
)
from promptir_tpu.ops.conv import Conv
from promptir_tpu.ops.embed import OverlapPatchEmbed
from promptir_tpu.ops.prompt import PromptGenBlock
from promptir_tpu.ops.resample import (
    Downsample,
    FewChannelConv3,
    Upsample,
)


class PromptIR(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_norm: bool = False
    decoder: bool = True
    dtype: jnp.dtype = jnp.float32
    fused_ffn: bool = False  # Pallas LN+GDFN fusion (inference/bench)
    remat: bool = False  # rematerialize blocks (memory <-> FLOPs trade)
    # With remat=True, restrict rematerialization to these U-Net levels
    # (1 = dim, 2 = 2*dim, 3 = 4*dim, 4 = latent). The pixel-heavy levels
    # 1-2 hold ~90% of activation memory but also ~85% of recompute cost;
    # levels 3-4's activations are cheap to store, so skipping their
    # replay trades a little memory for backward time. None = all levels.
    remat_levels: Optional[Sequence[int]] = None

    def _stack(self, name: str, n: int, dim: int, heads: int):
        common = dict(
            dim=dim,
            num_heads=heads,
            expansion=self.expansion,
            use_bias=self.use_bias,
            bias_free_norm=self.bias_free_norm,
            dtype=self.dtype,
            fused_ffn=self.fused_ffn,
        )
        level = {self.dim: 1, 2 * self.dim: 2, 4 * self.dim: 3,
                 8 * self.dim: 4}[dim]
        use_remat = self.remat and (
            self.remat_levels is None or level in self.remat_levels
        )
        cls = nn.remat(TransformerBlock) if use_remat else TransformerBlock
        return [cls(**common, name=f"{name}_{i}") for i in range(n)]

    def _run(self, name: str, n: int, dim: int, heads: int, x):
        """One level's block stack, chained in the kernels' padded layout
        when the fused path applies (remat wraps __call__'s static
        padded_shape arg, so chaining is for the non-remat path)."""
        return apply_block_stack(
            self._stack(name, n, dim, heads), x,
            fused=self.fused_ffn and not self.remat,
            expansion=self.expansion,
        )

    @nn.compact
    def __call__(self, inp_img: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        nb = self.num_blocks
        hs = self.heads
        conv = lambda cout, k, name: Conv(  # noqa: E731
            cout,
            (k, k),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name=name,
        )

        # --- dead layers (checkpoint parity only; XLA removes them) ---
        DeadConv(64, 64, self.use_bias, name="chnl_reduce1")()
        DeadConv(128, 128, self.use_bias, name="chnl_reduce2")()
        DeadConv(320, 256, self.use_bias, name="chnl_reduce3")()
        DeadConv(d + 64, d, self.use_bias, name="reduce_noise_channel_1")()
        DeadConv(2 * d + 128, 2 * d, self.use_bias, name="reduce_noise_channel_2")()
        DeadConv(4 * d + 256, 4 * d, self.use_bias, name="reduce_noise_channel_3")()

        # Level-1 glue elision (fused inference): when the level-1 fused
        # chain will run, the patch embed emits the kernels' padded layout
        # directly and the encoder stack consumes it — skipping the
        # layout-fix copy + entry pad (~6.5 ms at 512^2 batch 16); the
        # decoder end likewise hands its padded exit straight to the
        # output head (apply_block_stack(out_padded) + FewChannelConv3).
        fused_chain = self.fused_ffn and not self.remat
        chain1 = False
        if fused_chain and not self.use_bias and nb[0] > 1:
            from promptir_tpu.ops.pallas.autodiff import block_fits
            from promptir_tpu.parallel.spatial import current_spatial_axis

            _, ih, iw, _ = inp_img.shape
            chain1 = current_spatial_axis() is None and block_fits(
                ih, iw, d, 2 * int(d * self.expansion), hs[0]
            )

        x = OverlapPatchEmbed(d, self.use_bias, self.dtype, name="patch_embed")(
            inp_img.astype(self.dtype), padded_out=chain1
        )

        # --- encoder ---
        enc1_padded = None
        if chain1:
            # keep enc1 in the padded layout: down1_2's folded conv and
            # the decoder concat both consume it without the exit slice
            x, enc1_padded = apply_block_stack(
                self._stack("encoder_level1", nb[0], d, hs[0]), x,
                fused=True, expansion=self.expansion, in_padded=(iw, d),
                out_padded=True,
            )
        else:
            x = self._run("encoder_level1", nb[0], d, hs[0], x)
        enc1 = x
        if enc1_padded is not None:
            x = Downsample(d, self.dtype, name="down1_2")(
                x, padded_shape=enc1_padded
            )
        else:
            x = Downsample(d, self.dtype, name="down1_2")(x)

        def _run_enc(name, n, dim, heads, x):
            """Encoder stack whose exit stays padded when the fused chain
            applies: the following Downsample consumes the padded layout
            and the decoder concat slices it lazily."""
            from promptir_tpu.parallel.spatial import current_spatial_axis

            if not (
                fused_chain and not self.use_bias and n > 1
                and current_spatial_axis() is None
            ):
                return self._run(name, n, dim, heads, x), None
            y = apply_block_stack(
                self._stack(name, n, dim, heads), x,
                fused=True, expansion=self.expansion, out_padded=True,
            )
            return y if isinstance(y, tuple) else (y, None)

        x, enc2_padded = _run_enc("encoder_level2", nb[1], 2 * d, hs[1], x)
        enc2 = x
        if enc2_padded is not None:
            x = Downsample(2 * d, self.dtype, name="down2_3")(
                x, padded_shape=enc2_padded
            )
        else:
            x = Downsample(2 * d, self.dtype, name="down2_3")(x)
        x, enc3_padded = _run_enc("encoder_level3", nb[2], 4 * d, hs[2], x)
        enc3 = x
        if enc3_padded is not None:
            x = Downsample(4 * d, self.dtype, name="down3_4")(
                x, padded_shape=enc3_padded
            )
        else:
            x = Downsample(4 * d, self.dtype, name="down3_4")(x)
        x = self._run("latent", nb[3], 8 * d, hs[3], x)

        # --- prompt injection at the latent (level-3 prompt) ---
        if self.decoder:
            p3 = PromptGenBlock(
                320, 5, 16, 8 * d, dtype=self.dtype, name="prompt3"
            )(x)
            x = jnp.concatenate([x, p3], axis=-1)
            x = TransformerBlock(
                8 * d + 320,
                hs[2],
                self.expansion,
                self.use_bias,
                self.bias_free_norm,
                self.dtype,
                self.fused_ffn,
                name="noise_level3",
            )(x)
            x = conv(4 * d, 1, "reduce_noise_level3")(x)

        # --- decoder level 3 ---
        x = Upsample(4 * d, self.dtype, name="up4_3")(x)
        if enc3_padded is not None:
            w3, c3 = enc3_padded
            enc3 = enc3[:, :, 1 : 1 + w3, :c3]
        x = jnp.concatenate([x, enc3], axis=-1)
        x = conv(4 * d, 1, "reduce_chan_level3")(x)
        x = self._run("decoder_level3", nb[2], 4 * d, hs[2], x)

        if self.decoder:
            p2 = PromptGenBlock(
                128, 5, 32, 4 * d, dtype=self.dtype, name="prompt2"
            )(x)
            x = jnp.concatenate([x, p2], axis=-1)
            x = TransformerBlock(
                4 * d + 128,
                hs[2],
                self.expansion,
                self.use_bias,
                self.bias_free_norm,
                self.dtype,
                self.fused_ffn,
                name="noise_level2",
            )(x)
            x = conv(4 * d, 1, "reduce_noise_level2")(x)

        # --- decoder level 2 ---
        x = Upsample(4 * d, self.dtype, name="up3_2")(x)
        if enc2_padded is not None:
            w2, c2 = enc2_padded
            enc2 = enc2[:, :, 1 : 1 + w2, :c2]
        x = jnp.concatenate([x, enc2], axis=-1)
        x = conv(2 * d, 1, "reduce_chan_level2")(x)
        x = self._run("decoder_level2", nb[1], 2 * d, hs[1], x)

        if self.decoder:
            p1 = PromptGenBlock(
                64, 5, 64, 2 * d, dtype=self.dtype, name="prompt1"
            )(x)
            x = jnp.concatenate([x, p1], axis=-1)
            x = TransformerBlock(
                2 * d + 64,
                hs[2],
                self.expansion,
                self.use_bias,
                self.bias_free_norm,
                self.dtype,
                self.fused_ffn,
                name="noise_level1",
            )(x)
            x = conv(2 * d, 1, "reduce_noise_level1")(x)

        # --- decoder level 1 (96ch, no reduce after up) ---
        # decoder_level1 and refinement are back-to-back same-shape stacks:
        # run them as ONE padded chain (saves an exit slice + entry pad,
        # ~6.6 ms at 512^2 batch 16) and hand the padded exit straight to
        # the output head.
        x = Upsample(2 * d, self.dtype, name="up2_1")(x)
        if enc1_padded is not None:
            w1, c1 = enc1_padded
            enc1 = enc1[:, :, 1 : 1 + w1, :c1]  # fuses into the entry pad
        x = jnp.concatenate([x, enc1], axis=-1)
        x, padded = apply_block_stack(
            self._stack("decoder_level1", nb[0], 2 * d, hs[0])
            + self._stack(
                "refinement", self.num_refinement_blocks, 2 * d, hs[0]
            ),
            x,
            fused=fused_chain,
            expansion=self.expansion,
            out_padded=True,
        )

        out = FewChannelConv3(
            self.out_channels, self.use_bias, self.dtype, name="output"
        )(x, padded_shape=padded)
        return (out + inp_img.astype(out.dtype)).astype(jnp.float32)


@register_model("promptir")
def _promptir(**kwargs) -> PromptIR:
    return PromptIR(**kwargs)
