"""MDTA — multi-dconv-head *transposed* (channel) self-attention, NHWC.

Parity target: /root/reference/net/model.py:105-138. qkv = 1x1 conv (C->3C)
followed by a 3x3 depthwise conv; q and k are L2-normalized along the
*spatial* axis; attention is a (C/head x C/head) channel-channel matrix per
head, scaled by a learned per-head temperature, softmaxed over the last
axis; out = attn @ v, then a 1x1 output projection.

TPU notes: the attention contractions are `(HW x d)^T (HW x d)` einsums —
large, static matmuls that land straight on the MXU. Cost is linear in
pixels (the d x d matrix is tiny), which is why this architecture scales to
high-resolution restoration. Softmax runs in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.ops.conv import Conv, Dense


def channel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """Core transposed attention. q,k,v: (B,H,W,C); temperature: (heads,).

    Returns (B,H,W,C). Head h covers channel slab [h*d, (h+1)*d) to match
    the reference's `b (head c) h w` packing.
    """
    b, h, w, c = q.shape
    d = c // num_heads
    s = h * w
    dtype = q.dtype

    # Under a spatial-sharding trace (parallel/spatial.py) each shard holds
    # an H stripe: the spatial reductions (L2 norms, channel Gram) are
    # computed over the local rows and psummed — the attention matrix then
    # comes out replicated-exact on every shard. This is THE global
    # coupling of MDTA; everything else in the block is local or halo-local.
    from promptir_tpu.parallel.spatial import current_spatial_axis

    axis = current_spatial_axis()

    def split(x):
        return x.reshape(b, s, num_heads, d)

    q, k, v = split(q), split(k), split(v)

    # L2-normalize along the spatial axis (reference normalizes dim=-1 of
    # (b, head, c, hw), i.e. over hw). torch eps: clamp norm to >= 1e-12.
    # Stats accumulate in fp32; the full-res tensors stay in the compute
    # dtype (bandwidth: no fp32 copies of HxW activations materialize).
    def l2norm_spatial(x):
        sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1, keepdims=True)
        if axis is not None:
            sq = jax.lax.psum(sq, axis)
        inv = jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        return x * inv.astype(dtype)

    qn = l2norm_spatial(q)
    kn = l2norm_spatial(k)

    # attn[b,h,i,j] = sum_s qn[b,s,h,i] * kn[b,s,h,j]   -> (B, heads, d, d)
    # d x d output is tiny; accumulate in fp32 on the MXU
    attn = jnp.einsum(
        "bshi,bshj->bhij", qn, kn, preferred_element_type=jnp.float32
    )
    if axis is not None:
        attn = jax.lax.psum(attn, axis)
    attn = attn * temperature.astype(jnp.float32)[None, :, None, None]
    attn = jax.nn.softmax(attn, axis=-1)

    # out[b,s,h,i] = sum_j attn[b,h,i,j] * v[b,s,h,j]
    out = jnp.einsum(
        "bhij,bshj->bshi", attn.astype(dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    return out.reshape(b, h, w, c)


class MDTA(nn.Module):
    """Transposed channel self-attention with depthwise-augmented qkv."""

    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.dim
        qkv = Conv(
            c * 3, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="qkv"
        )(x)
        qkv = Conv(
            c * 3,
            (3, 3),
            padding=((1, 1), (1, 1)),
            feature_group_count=c * 3,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="qkv_dwconv",
        )(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        temperature = self.param(
            "temperature", nn.initializers.ones, (self.num_heads,)
        )
        out = channel_attention(q, k, v, temperature, self.num_heads)
        out = out.astype(x.dtype)
        return Conv(
            c, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            name="project_out",
        )(out)
