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
    _ConvKernel,
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
        if self.fused_ffn and not self.use_bias:
            # The fused whole-block path is its own remat boundary: its
            # custom VJP saves only the block input + weights and
            # recomputes the rest in the backward (ops/pallas/autodiff.py).
            # nn.remat on top replays the fused forward a second time for
            # nothing (measured 925 vs 528 ms/step at batch 24/128^2,
            # TRAIN_BENCH.md round 3), so fused blocks stay unwrapped and
            # only their plain-XLA fallbacks checkpoint themselves.
            common["remat_fallback"] = use_remat
            cls = TransformerBlock
        else:
            cls = (
                nn.remat(TransformerBlock) if use_remat else TransformerBlock
            )
        return [cls(**common, name=f"{name}_{i}") for i in range(n)]

    def _noise_block(self, name: str, dim: int, heads: int, level: int):
        """Prompt-interaction TransformerBlock with the same remat policy
        as `_stack` (level-gated; fused blocks self-checkpoint, so only
        their plain-XLA fallback paths get jax.checkpoint)."""
        use_remat = self.remat and (
            self.remat_levels is None or level in self.remat_levels
        )
        common = dict(
            dim=dim,
            num_heads=heads,
            expansion=self.expansion,
            use_bias=self.use_bias,
            bias_free_norm=self.bias_free_norm,
            dtype=self.dtype,
            fused_ffn=self.fused_ffn,
        )
        if self.fused_ffn and not self.use_bias:
            common["remat_fallback"] = use_remat
            cls = TransformerBlock
        else:
            cls = (
                nn.remat(TransformerBlock) if use_remat else TransformerBlock
            )
        return cls(**common, name=name)

    def _run(self, name: str, n: int, dim: int, heads: int, x):
        """One level's block stack, chained in the kernels' padded layout
        when the fused path applies."""
        return apply_block_stack(
            self._stack(name, n, dim, heads), x,
            fused=self.fused_ffn,
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

        # Glue elision (fused path): when a level's fused chain will
        # run, its entry producer emits the kernels' padded layout
        # directly (patch embed / Downsample padded_out — dirty border
        # columns, which the kernels tolerate) and its exit stays padded
        # for the next consumer (folded downsample, decoder seam, output
        # head) — the per-seam layout-fix copies, pads and slices never
        # materialize. Training uses the same chain (fused blocks are
        # their own remat boundary, see _stack); sharded traces keep the
        # plain layout.
        fused_chain = self.fused_ffn and not self.use_bias
        if fused_chain:
            from promptir_tpu.parallel.spatial import current_spatial_axis

            fused_chain = current_spatial_axis() is None
        _, ih, iw, _ = inp_img.shape

        def _chains(n, level_h, level_w, dim, heads):
            """True when the level's stack will run as one padded fused
            chain."""
            if not (fused_chain and n > 1):
                return False
            from promptir_tpu.ops.pallas.autodiff import block_fits

            return block_fits(
                level_h, level_w, dim, 2 * int(dim * self.expansion), heads
            )

        chain1 = _chains(nb[0], ih, iw, d, hs[0])
        chain2 = _chains(nb[1], ih // 2, iw // 2, 2 * d, hs[1])
        chain3 = _chains(nb[2], ih // 4, iw // 4, 4 * d, hs[2])

        x = OverlapPatchEmbed(d, self.use_bias, self.dtype, name="patch_embed")(
            inp_img.astype(self.dtype), padded_out=chain1
        )

        # --- encoder ---
        def _enc_level(name, n, dim, heads, x, chained, in_padded):
            """One encoder stack; exit stays padded when it chains (the
            following Downsample and the decoder seam both consume the
            padded layout without an exit slice)."""
            if not chained:
                # Both call sites gate in_padded on the same chain flag, so
                # a padded input can only arrive when chained is True.
                assert in_padded is None
                return self._run(name, n, dim, heads, x), None
            y = apply_block_stack(
                self._stack(name, n, dim, heads), x,
                fused=True, expansion=self.expansion, in_padded=in_padded,
                out_padded=True,
            )
            return y if isinstance(y, tuple) else (y, None)

        x, enc1_padded = _enc_level(
            "encoder_level1", nb[0], d, hs[0], x, chain1,
            (iw, d) if chain1 else None,
        )
        enc1 = x
        x = Downsample(d, self.dtype, name="down1_2")(
            x, padded_shape=enc1_padded,
            padded_out=enc1_padded is not None and chain2,
        )
        x, enc2_padded = _enc_level(
            "encoder_level2", nb[1], 2 * d, hs[1], x, chain2,
            (iw // 2, 2 * d) if enc1_padded is not None and chain2 else None,
        )
        enc2 = x
        x = Downsample(2 * d, self.dtype, name="down2_3")(
            x, padded_shape=enc2_padded,
            padded_out=enc2_padded is not None and chain3,
        )
        x, enc3_padded = _enc_level(
            "encoder_level3", nb[2], 4 * d, hs[2], x, chain3,
            (iw // 4, 4 * d) if enc2_padded is not None and chain3 else None,
        )
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
            x = self._noise_block("noise_level3", 8 * d + 320, hs[2], 4)(x)
            x = conv(4 * d, 1, "reduce_noise_level3")(x)

        def _dec_entry(x, enc, enc_padded, n_feat, cout, up_name, red_name,
                       stack_name, n, heads):
            """Decoder-level entry: upsample + skip concat + 1x1 reduce +
            block stack. When the skip is resident in the fused kernels'
            padded layout and the stack will chain, the seam runs fused:
            reduce(concat([up, enc])) == up @ W[:cu] + enc @ W[cu:], so the
            up-half of the reduce composes into the up-conv kernel
            (Upsample fold), the enc-half is a 1x1 that consumes AND
            produces the padded layout (zero borders stay zero), and their
            sum IS the stack's padded entry — the concat, the skip's
            exit-slice, the reduce's full-resolution pass and the entry pad
            all collapse into one fusion (PROFILE.md round-4 seam plan).
            Exact up to fp reassociation of the reduce's channel sum
            (covered by test_promptir_fused_chain_matches_unfused)."""
            cu = n_feat // 2  # up-branch channels after pixel-shuffle
            use_seam = False
            if enc_padded is not None and not self.use_bias and n > 1:
                from promptir_tpu.ops.pallas.autodiff import block_fits

                w_real, c_real = enc_padded
                use_seam = block_fits(
                    2 * x.shape[1], w_real, cout,
                    2 * int(cout * self.expansion), heads,
                )
            if use_seam:
                from promptir_tpu.ops.pallas.gdfn import _lanes

                w_red = _ConvKernel(
                    (1, 1, cu + c_real, cout), name=red_name
                )().reshape(cu + c_real, cout)
                up = Upsample(n_feat, self.dtype, name=up_name)(
                    x, fold=w_red[:cu]
                )
                _, _, wp, _ = enc.shape
                cp_out = _lanes(cout)
                w_enc = jnp.pad(
                    w_red[cu:],
                    ((0, enc.shape[-1] - c_real), (0, cp_out - cout)),
                )
                xp = jnp.einsum(
                    "bhwc,cd->bhwd", enc, w_enc.astype(enc.dtype)
                ) + jnp.pad(
                    up,
                    ((0, 0), (0, 0), (1, wp - w_real - 1),
                     (0, cp_out - cout)),
                )
                return apply_block_stack(
                    self._stack(stack_name, n, cout, heads), xp,
                    fused=True, expansion=self.expansion,
                    in_padded=(w_real, cout),
                )
            x = Upsample(n_feat, self.dtype, name=up_name)(x)
            if enc_padded is not None:
                w_real, c_real = enc_padded
                enc = enc[:, :, 1 : 1 + w_real, :c_real]
            x = jnp.concatenate([x, enc], axis=-1)
            x = conv(cout, 1, red_name)(x)
            return self._run(stack_name, n, cout, heads, x)

        # --- decoder level 3 ---
        x = _dec_entry(x, enc3, enc3_padded, 4 * d, 4 * d, "up4_3",
                       "reduce_chan_level3", "decoder_level3", nb[2], hs[2])

        if self.decoder:
            p2 = PromptGenBlock(
                128, 5, 32, 4 * d, dtype=self.dtype, name="prompt2"
            )(x)
            x = jnp.concatenate([x, p2], axis=-1)
            x = self._noise_block("noise_level2", 4 * d + 128, hs[2], 3)(x)
            x = conv(4 * d, 1, "reduce_noise_level2")(x)

        # --- decoder level 2 ---
        x = _dec_entry(x, enc2, enc2_padded, 4 * d, 2 * d, "up3_2",
                       "reduce_chan_level2", "decoder_level2", nb[1], hs[1])

        if self.decoder:
            p1 = PromptGenBlock(
                64, 5, 64, 2 * d, dtype=self.dtype, name="prompt1"
            )(x)
            x = jnp.concatenate([x, p1], axis=-1)
            x = self._noise_block("noise_level1", 2 * d + 64, hs[2], 2)(x)
            x = conv(2 * d, 1, "reduce_noise_level1")(x)

        # --- decoder level 1 (96ch, no reduce after up) ---
        # decoder_level1 and refinement are back-to-back same-shape stacks:
        # run them as ONE padded chain (saves an exit slice + entry pad,
        # ~6.6 ms at 512^2 batch 16) and hand the padded exit straight to
        # the output head.
        in_padded1 = None
        if enc1_padded is not None:
            # padded-space concat (dec1 has no reduce to fold): the up
            # branch lands in lanes 0:d at cols 1:1+w and the skip — still
            # resident in the padded layout from the encoder — shifts to
            # lanes d:2d. Preferred path: ONE Pallas pass reads the raw
            # up-conv output (ij-major lanes, no shuffle materialization)
            # + the padded skip and writes the chain's padded entry
            # (ops/pallas/seam.py — replaces the copy.535/copy.536/
            # pad_add_fusion trio, 9.0 ms at 512^2x16, PROFILE.md round-5
            # table). Fallback: the jnp pad+add composition (same math;
            # the seam kernel is pure data movement, bit-exact).
            import os

            from promptir_tpu.ops.pallas import seam as _seam_mod
            from promptir_tpu.ops.pallas.gdfn import _lanes

            w1, c1 = enc1_padded
            wp1 = enc1.shape[2]
            cp1 = _lanes(2 * d)
            hc, wc = x.shape[1], x.shape[2]
            if (
                os.environ.get("PROMPTIR_SEAM_KERNEL", "1") != "0"
                and os.environ.get("PROMPTIR_SHUFFLE_IJ", "1") != "0"
                and 2 * wc == w1
                and _seam_mod.seam_fits(
                    hc, wc, _lanes(4 * d), wp1, cp1,
                    _seam_mod.INTERPRET,
                )
            ):
                up_raw = Upsample(2 * d, self.dtype, name="up2_1")(
                    x, emit_ij_padded=True
                )
                x = _seam_mod.shuffle_concat_pad(
                    up_raw, enc1, d, interpret=_seam_mod.INTERPRET
                )
                assert x is not None  # seam_fits pre-checked the shape
            else:
                x = Upsample(2 * d, self.dtype, name="up2_1")(x)
                x = jnp.pad(
                    x, ((0, 0), (0, 0), (1, wp1 - w1 - 1), (0, cp1 - c1))
                ) + jnp.pad(
                    enc1[:, :, :, :c1],
                    ((0, 0), (0, 0), (0, 0), (c1, cp1 - 2 * c1)),
                )
            in_padded1 = (w1, 2 * d)
        else:
            x = Upsample(2 * d, self.dtype, name="up2_1")(x)
            x = jnp.concatenate([x, enc1], axis=-1)
        x, padded = apply_block_stack(
            self._stack("decoder_level1", nb[0], 2 * d, hs[0])
            + self._stack(
                "refinement", self.num_refinement_blocks, 2 * d, hs[0]
            ),
            x,
            fused=fused_chain,
            expansion=self.expansion,
            in_padded=in_padded1,
            out_padded=True,
        )

        out = FewChannelConv3(
            self.out_channels, self.use_bias, self.dtype, name="output"
        )(x, padded_shape=padded)
        return (out + inp_img.astype(out.dtype)).astype(jnp.float32)


@register_model("promptir")
def _promptir(**kwargs) -> PromptIR:
    return PromptIR(**kwargs)
