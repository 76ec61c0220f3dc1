"""CAPromptUformerIR — Uformer skeleton with CAMixer-v1 token blocks.

Parity target: /root/reference/net/camixer_prompt_uformer.py:1249-1712.
Every stage block is `LN -> CAMixer(v1, token grid) -> LN -> LeFF`
(:1249-1277); the 9-stage U-Net skeleton, prompt blocks (LeWin
interaction, dims 512/512/256/128 at sizes 8/16/32/64) and projections are
the PromptUformer ones. No global condition predictor — the mixers see
only the per-window coordinate channels. Training forwards accumulate the
per-stage routing decisions.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from promptir_tpu.models import register_model
from promptir_tpu.models.prompt_uformer import UformerPromptBlock
from promptir_tpu.ops.camixer import CAMixerV1
from promptir_tpu.ops.window_attention import (
    DropPath,
    InputProj,
    LeFF,
    OutputProj,
    TorchLayerNorm,
    UformerDownsample,
    UformerUpsample,
)


class CAUformerBlock(nn.Module):
    """LN -> CAMixer v1 -> LN -> LeFF (token-grid NHWC)."""

    dim: int
    win_size: int = 8
    mlp_ratio: float = 4.0
    ratio: float = 0.5
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dp = DropPath(self.drop_path, name="drop_path")
        y = TorchLayerNorm(self.dim, name="norm1")(x)
        y, decision = CAMixerV1(
            self.dim, self.win_size, self.ratio, dtype=self.dtype,
            name="mixer",
        )(y, None, deterministic)
        x = x + dp(y, deterministic)
        z = LeFF(self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype,
                 name="mlp")(TorchLayerNorm(self.dim, name="norm2")(x))
        return x + dp(z, deterministic), decision


class CAUformerLayer(nn.Module):
    dim: int
    depth: int
    win_size: int = 8
    mlp_ratio: float = 4.0
    ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        decisions = []
        for i in range(self.depth):
            x, d = CAUformerBlock(
                self.dim, self.win_size, self.mlp_ratio, self.ratio,
                dtype=self.dtype, name=f"blocks_{i}",
            )(x, deterministic)
            decisions.append(d)
        return x, jnp.mean(jnp.stack(decisions))


class CAPromptUformerIR(nn.Module):
    in_chans: int = 3
    dd_in: int = 3
    embed_dim: int = 32
    depths: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 2)
    win_size: int = 8
    mlp_ratio: float = 4.0
    ratio: float = 0.5
    token_mlp: str = "leff"
    prompt: bool = True
    dtype: jnp.dtype = jnp.float32
    variant: str = "v1"  # stochastic-training marker for the trainer

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        e = self.embed_dim
        depths = self.depths
        decisions = []

        def stage(name, dim, depth):
            return CAUformerLayer(
                dim, depth, self.win_size, self.mlp_ratio, self.ratio,
                self.dtype, name=name,
            )

        def unpack(out):
            xx, d = out
            decisions.append(d)
            return xx

        def prompt_block(name, pdim, psize, lin, nh):
            return UformerPromptBlock(
                prompt_dim=pdim, prompt_len=5, prompt_size=psize, lin_dim=lin,
                num_heads=nh, win_size=self.win_size, mlp_ratio=self.mlp_ratio,
                token_mlp=self.token_mlp, dtype=self.dtype, name=name,
            )

        inp = x.astype(self.dtype)
        det = deterministic
        y = InputProj(e, self.dtype, name="input_proj")(inp)

        conv0 = unpack(stage("encoderlayer_0", e, depths[0])(y, det))
        pool0 = UformerDownsample(2 * e, self.dtype, name="dowsample_0")(conv0)
        conv1 = unpack(stage("encoderlayer_1", 2 * e, depths[1])(pool0, det))
        pool1 = UformerDownsample(4 * e, self.dtype, name="dowsample_1")(conv1)
        conv2 = unpack(stage("encoderlayer_2", 4 * e, depths[2])(pool1, det))
        pool2 = UformerDownsample(8 * e, self.dtype, name="dowsample_2")(conv2)
        conv3 = unpack(stage("encoderlayer_3", 8 * e, depths[3])(pool2, det))
        pool3 = UformerDownsample(16 * e, self.dtype, name="dowsample_3")(conv3)

        conv4 = unpack(stage("conv", 16 * e, depths[4])(pool3, det))
        if self.prompt:
            conv4 = prompt_block("promptlayer_0", 512, 8, 16 * e, 16)(conv4, det)

        up0 = UformerUpsample(8 * e, self.dtype, name="upsample_0")(conv4)
        d0 = jnp.concatenate([up0, conv3], axis=-1)
        d0 = unpack(stage("decoderlayer_0", 16 * e, depths[5])(d0, det))
        if self.prompt:
            d0 = prompt_block("promptlayer_1", 512, 16, 16 * e, 8)(d0, det)

        up1 = UformerUpsample(4 * e, self.dtype, name="upsample_1")(d0)
        d1 = jnp.concatenate([up1, conv2], axis=-1)
        d1 = unpack(stage("decoderlayer_1", 8 * e, depths[6])(d1, det))
        if self.prompt:
            d1 = prompt_block("promptlayer_2", 256, 32, 8 * e, 4)(d1, det)

        up2 = UformerUpsample(2 * e, self.dtype, name="upsample_2")(d1)
        d2 = jnp.concatenate([up2, conv1], axis=-1)
        d2 = unpack(stage("decoderlayer_2", 4 * e, depths[7])(d2, det))
        if self.prompt:
            d2 = prompt_block("promptlayer_3", 128, 64, 4 * e, 2)(d2, det)

        up3 = UformerUpsample(e, self.dtype, name="upsample_3")(d2)
        d3 = jnp.concatenate([up3, conv0], axis=-1)
        d3 = unpack(stage("decoderlayer_3", 2 * e, depths[8])(d3, det))

        out = OutputProj(self.in_chans, self.dtype, name="output_proj")(d3)
        if self.dd_in == 3:
            out = out + inp
        out = out.astype(jnp.float32)
        if deterministic:
            return out
        return out, jnp.mean(jnp.stack(decisions))


@register_model("capromptuformerir")
def _capu(**kwargs) -> CAPromptUformerIR:
    kwargs.setdefault("depths", (1, 2, 8, 8, 2, 8, 8, 2, 1))
    return CAPromptUformerIR(**kwargs)
