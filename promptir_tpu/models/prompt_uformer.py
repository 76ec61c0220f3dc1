"""PromptUformerIR: 9-stage Uformer U-Net with prompt blocks.

Parity target: /root/reference/net/prompt_uformer.py:1130-1381. Structure:
input 3x3 conv + LeakyReLU -> 4 encoder stages (LeWin blocks, 4x4/s2
down between) -> bottleneck -> 4 decoder stages (2x2 transposed-conv up,
channel-concat skips) -> output 3x3 conv + global residual. PromptBlocks
(gen with align_corners=True + LeWin interaction + 3x3 reduce,
:1069-1115) after the bottleneck and decoder stages 0-2 with prompt dims
512/512/256/128 and sizes 8/16/32/64 (:1289-1307). Shifted windows on odd
blocks per stage; per-window `modulator` embeddings in decoder stages when
enabled. Default training config (train.py:62): embed 32, depths
[1,2,8,8,2,8,8,2,1], heads [1,2,4,8,16,16,8,4,2], leff, modulator=True.
Registered as `promptuformerir` (/root/reference/train.py:313).

Layout: NHWC throughout (the reference's (B, L, C) token tensors are the
same data flattened; windows/shifts/convs all happen on the 2D grid).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from promptir_tpu.models import register_model
from promptir_tpu.ops.conv import Conv
from promptir_tpu.ops.window_attention import (
    InputProj,
    LeWinTransformerBlock,
    OutputProj,
    UformerDownsample,
    UformerUpsample,
)


class BasicUformerLayer(nn.Module):
    dim: int
    depth: int
    num_heads: int
    win_size: int = 8
    mlp_ratio: float = 4.0
    token_projection: str = "linear"
    token_mlp: str = "leff"
    shift_flag: bool = True
    modulator: bool = False
    drop_path: Sequence[float] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            shift = (
                0 if (i % 2 == 0 or not self.shift_flag) else self.win_size // 2
            )
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = LeWinTransformerBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                win_size=self.win_size,
                shift_size=shift,
                mlp_ratio=self.mlp_ratio,
                token_projection=self.token_projection,
                token_mlp=self.token_mlp,
                modulator=self.modulator,
                drop_path=dp,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic)
        return x


class UformerPromptBlock(nn.Module):
    """Prompt gen (align_corners=True) + LeWin interaction + 3x3 reduce."""

    prompt_dim: int
    prompt_len: int
    prompt_size: int
    lin_dim: int
    num_heads: int
    win_size: int = 8
    mlp_ratio: float = 4.0
    token_projection: str = "linear"
    token_mlp: str = "leff"
    modulator: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        bank = self.param(
            "prompt_param",
            nn.initializers.uniform(scale=1.0),
            (self.prompt_len, self.prompt_size, self.prompt_size, self.prompt_dim),
        )
        # this family's resize is align_corners=True
        # (/root/reference/net/prompt_uformer.py:1104)
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
        y = LeWinTransformerBlock(
            dim=self.lin_dim + self.prompt_dim,
            num_heads=self.num_heads,
            win_size=self.win_size,
            shift_size=0,
            mlp_ratio=self.mlp_ratio,
            token_projection=self.token_projection,
            token_mlp=self.token_mlp,
            modulator=self.modulator,
            dtype=self.dtype,
            name="attn",
        )(y, deterministic)
        return Conv(
            self.lin_dim, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, name="conv",
        )(y)


class PromptUformerIR(nn.Module):
    in_chans: int = 3
    dd_in: int = 3
    embed_dim: int = 32
    depths: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 4, 8, 16, 16, 8, 4, 2)
    win_size: int = 8
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    token_projection: str = "linear"
    token_mlp: str = "leff"
    shift_flag: bool = True
    modulator: bool = False
    cross_modulator: bool = False
    prompt: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        e = self.embed_dim
        depths = self.depths
        heads = self.num_heads
        n_enc = len(depths) // 2
        enc_dpr = list(
            np.linspace(0, self.drop_path_rate, sum(depths[:n_enc]))
        )
        conv_dpr = [self.drop_path_rate] * depths[4]
        dec_dpr = enc_dpr[::-1]

        def stage(name, dim, depth, nh, dpr, modulator=False):
            return BasicUformerLayer(
                dim=dim,
                depth=depth,
                num_heads=nh,
                win_size=self.win_size,
                mlp_ratio=self.mlp_ratio,
                token_projection=self.token_projection,
                token_mlp=self.token_mlp,
                shift_flag=self.shift_flag,
                modulator=modulator,
                drop_path=tuple(dpr),
                dtype=self.dtype,
                name=name,
            )

        inp = x.astype(self.dtype)
        y = InputProj(e, self.dtype, name="input_proj")(inp)

        det = deterministic
        conv0 = stage("encoderlayer_0", e, depths[0], heads[0],
                      enc_dpr[: depths[0]])(y, det)
        pool0 = UformerDownsample(2 * e, self.dtype, name="dowsample_0")(conv0)
        conv1 = stage("encoderlayer_1", 2 * e, depths[1], heads[1],
                      enc_dpr[sum(depths[:1]): sum(depths[:2])])(pool0, det)
        pool1 = UformerDownsample(4 * e, self.dtype, name="dowsample_1")(conv1)
        conv2 = stage("encoderlayer_2", 4 * e, depths[2], heads[2],
                      enc_dpr[sum(depths[:2]): sum(depths[:3])])(pool1, det)
        pool2 = UformerDownsample(8 * e, self.dtype, name="dowsample_2")(conv2)
        conv3 = stage("encoderlayer_3", 8 * e, depths[3], heads[3],
                      enc_dpr[sum(depths[:3]): sum(depths[:4])])(pool2, det)
        pool3 = UformerDownsample(16 * e, self.dtype, name="dowsample_3")(conv3)

        conv4 = stage("conv", 16 * e, depths[4], heads[4], conv_dpr)(pool3, det)

        def prompt_block(name, pdim, psize, lin, nh):
            return UformerPromptBlock(
                prompt_dim=pdim, prompt_len=5, prompt_size=psize, lin_dim=lin,
                num_heads=nh, win_size=self.win_size, mlp_ratio=self.mlp_ratio,
                token_projection=self.token_projection,
                token_mlp=self.token_mlp, modulator=self.modulator,
                dtype=self.dtype, name=name,
            )

        if self.prompt:
            conv4 = prompt_block("promptlayer_0", 512, 8, 16 * e, 16)(conv4, det)

        up0 = UformerUpsample(8 * e, self.dtype, name="upsample_0")(conv4)
        deconv0 = jnp.concatenate([up0, conv3], axis=-1)
        deconv0 = stage("decoderlayer_0", 16 * e, depths[5], heads[5],
                        dec_dpr[: depths[5]], self.modulator)(deconv0, det)
        if self.prompt:
            deconv0 = prompt_block("promptlayer_1", 512, 16, 16 * e, 8)(
                deconv0, det
            )

        up1 = UformerUpsample(4 * e, self.dtype, name="upsample_1")(deconv0)
        deconv1 = jnp.concatenate([up1, conv2], axis=-1)
        deconv1 = stage("decoderlayer_1", 8 * e, depths[6], heads[6],
                        dec_dpr[sum(depths[5:6]): sum(depths[5:7])],
                        self.modulator)(deconv1, det)
        if self.prompt:
            deconv1 = prompt_block("promptlayer_2", 256, 32, 8 * e, 4)(
                deconv1, det
            )

        up2 = UformerUpsample(2 * e, self.dtype, name="upsample_2")(deconv1)
        deconv2 = jnp.concatenate([up2, conv1], axis=-1)
        deconv2 = stage("decoderlayer_2", 4 * e, depths[7], heads[7],
                        dec_dpr[sum(depths[5:7]): sum(depths[5:8])],
                        self.modulator)(deconv2, det)
        if self.prompt:
            deconv2 = prompt_block("promptlayer_3", 128, 64, 4 * e, 2)(
                deconv2, det
            )

        up3 = UformerUpsample(e, self.dtype, name="upsample_3")(deconv2)
        deconv3 = jnp.concatenate([up3, conv0], axis=-1)
        deconv3 = stage("decoderlayer_3", 2 * e, depths[8], heads[8],
                        dec_dpr[sum(depths[5:8]): sum(depths[5:9])],
                        self.modulator)(deconv3, det)

        out = OutputProj(self.in_chans, self.dtype, name="output_proj")(deconv3)
        if self.dd_in == 3:
            out = out + inp
        return out.astype(jnp.float32)


@register_model("promptuformerir")
def _promptuformer(**kwargs) -> PromptUformerIR:
    kwargs.setdefault("depths", (1, 2, 8, 8, 2, 8, 8, 2, 1))
    kwargs.setdefault("modulator", True)
    return PromptUformerIR(**kwargs)
