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


def prompt_gap_weights(
    x: jnp.ndarray, prompt_len: int, dtype, name: str = "linear_layer"
) -> jnp.ndarray:
    """softmax(Linear(GAP(x))) mixing weights (reference model.py:229-230).

    Call from inside a flax @compact body (creates the `name` Dense there).
    Under a spatial-sharding trace the GAP is exact: equal stripes ->
    pmean of local means (parallel/spatial.py:global_mean_hw)."""
    from promptir_tpu.parallel.spatial import global_mean_hw

    emb = global_mean_hw(x, keepdims=False)  # (B, C)
    logits = Dense(prompt_len, dtype=dtype, name=name)(emb)
    return nn.softmax(logits.astype(jnp.float32), axis=-1)


def mix_and_resize_prompt(
    bank: jnp.ndarray,
    weights: jnp.ndarray,
    h: int,
    w: int,
    align_corners: bool,
    dtype,
) -> jnp.ndarray:
    """Weighted bank sum resized to the (possibly sharded) feature grid.

    (B,L) x (L,S,S,C) -> (B,h,w,C). Under a spatial-sharding trace `h` is
    this shard's stripe: the tiny mix is computed replicated, the bilinear
    resize runs at GLOBAL row coordinates, and the shard slices its own
    rows — bit-identical to the unsharded resize."""
    import jax

    from promptir_tpu.parallel.spatial import current_spatial_axis

    prompt = jnp.einsum(
        "bl,lhwc->bhwc", weights, bank.astype(jnp.float32)
    ).astype(dtype)
    axis = current_spatial_axis()
    if axis is None:
        return resize_bilinear(prompt, (h, w), align_corners)
    n = jax.lax.axis_size(axis)
    full = resize_bilinear(prompt, (h * n, w), align_corners)
    start = jax.lax.axis_index(axis) * h
    return jax.lax.dynamic_slice_in_dim(full, start, h, axis=1)


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
        weights = prompt_gap_weights(x, self.prompt_len, self.dtype)
        prompt = mix_and_resize_prompt(
            bank, weights, h, w, self.align_corners, x.dtype
        )
        return Conv(
            self.prompt_dim,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv3x3",
        )(prompt)
