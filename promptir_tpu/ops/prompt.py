"""Prompt Generation Module — the core idea of PromptIR.

Parity target: /root/reference/net/model.py:218-235. A learned bank of
`prompt_len` prompt maps (uniform[0,1) init). Input-conditioned mixing
weights come from softmax(Linear(GAP(x))); the weighted sum of the bank is
bilinearly resized to the feature resolution and passed through a bias-free
3x3 conv. The degradation identity is *learned* into this bank — no task
label is ever given at inference.

Storage is (L, S, S, C) (NHWC-like) so the resize + conv stay channels-last;
the checkpoint converter transposes from torch's (1, L, C, S, S).

`align_corners` is a config knob because the reference family disagrees
with itself: False in the canonical model (model.py:232), True in the
XRestormer flavors (prompt_xrestormer.py:351).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.ops.conv import Conv, Dense

from promptir_tpu.ops.resize import resize_bilinear


class PromptGenBlock(nn.Module):
    prompt_dim: int = 128
    prompt_len: int = 5
    prompt_size: int = 96
    lin_dim: int = 192
    align_corners: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = x.shape
        bank = self.param(
            "prompt_param",
            nn.initializers.uniform(scale=1.0),
            (self.prompt_len, self.prompt_size, self.prompt_size, self.prompt_dim),
        )
        # Under a spatial-sharding trace (parallel/spatial.py) `x` is an H
        # stripe: the GAP becomes a pmean (equal stripes -> exact global
        # mean); the tiny bank mix is computed replicated; the bilinear
        # resize runs at GLOBAL row coordinates and this shard slices its
        # own rows.
        import jax

        from promptir_tpu.parallel.spatial import current_spatial_axis

        axis = current_spatial_axis()
        emb = jnp.mean(x, axis=(1, 2))  # (B, lin_dim) global average pool
        if axis is not None:
            emb = jax.lax.pmean(emb, axis)
        logits = Dense(
            self.prompt_len, dtype=self.dtype, name="linear_layer"
        )(emb)
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1)

        # (B,L) x (L,S,S,C) -> (B,S,S,C)
        prompt = jnp.einsum(
            "bl,lhwc->bhwc", weights, bank.astype(jnp.float32)
        ).astype(x.dtype)
        if axis is not None:
            n = jax.lax.axis_size(axis)
            full = resize_bilinear(prompt, (h * n, w), self.align_corners)
            start = jax.lax.axis_index(axis) * h
            prompt = jax.lax.dynamic_slice_in_dim(full, start, h, axis=1)
        else:
            prompt = resize_bilinear(prompt, (h, w), self.align_corners)
        return Conv(
            self.prompt_dim,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv3x3",
        )(prompt)
