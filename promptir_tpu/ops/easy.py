"""NAFNet-style "easy" (attention-free) blocks, NHWC.

Parity targets: /root/reference/net/easy_promptxrestormer.py:85-250 and
/root/reference/net/nafnet.py:22-82.
  * SimpleGate — split channels in two, multiply;
  * EasyFeedForward — 1x1 to pow2-rounded 2.66*dim, gate, 1x1, 1x1 out;
  * EasyChannelAttention — 1x1 -> dw3x3 -> gate -> simplified channel
    attention (global-pool scale) -> 1x1 -> 1x1 out;
  * EasySpatialAttention — value projection scaled by a 1-channel sigmoid
    map from a tiny convnet (1x1 -> LN(eps 1e-6) -> LeakyReLU(0.1) ->
    3x3 -> sigmoid);
  * NAFBlock — LN(1e-6) -> 1x1/dw3x3/gate/SCA/1x1 + beta residual, then
    LN -> 1x1/gate/1x1 + gamma residual.

All are VPU/elementwise-friendly: 1x1 convs are MXU matmuls, gates and
scales fuse into them under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from promptir_tpu.ops.conv import Conv
from promptir_tpu.ops.norm import RestormerLayerNorm


def round_to_nearest_power_of_2(x: int) -> int:
    if x & (x - 1) == 0:
        return x
    msb = x.bit_length() - 1
    lower, upper = 1 << msb, 1 << (msb + 1)
    return lower if x < (lower + upper) // 2 else upper


def simple_gate(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


class ChannelsLN(nn.Module):
    """LayerNorm over channels with eps 1e-6 (basicsr LayerNorm2d /
    ConvNeXt-style LayerNorm in the reference)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        return (((xf - mu) / jnp.sqrt(var + self.eps)) * w + b).astype(x.dtype)


class EasyFeedForward(nn.Module):
    dim: int
    expansion: float = 2.66
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ffn = round_to_nearest_power_of_2(int(self.expansion * self.dim))
        y = Conv(ffn, (1, 1), use_bias=True, dtype=self.dtype, name="conv1")(x)
        y = simple_gate(y)
        y = Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype,
                 name="conv2")(y)
        return Conv(self.dim, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, name="project_out")(y)


class EasyChannelAttention(nn.Module):
    dim: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.dim
        y = Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="conv1")(x)
        y = Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                 use_bias=True, dtype=self.dtype, name="conv2")(y)
        y = simple_gate(y)
        # simplified channel attention: global-average-pooled 1x1 scale
        # (sharding-aware: pmean under a spatial-sharding trace)
        from promptir_tpu.parallel.spatial import global_mean_hw

        pooled = global_mean_hw(y)
        scale = Conv(c // 2, (1, 1), use_bias=True, dtype=self.dtype,
                     name="sca_1")(pooled)
        y = y * scale
        y = Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="conv3")(y)
        return Conv(c, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
                    name="project_out")(y)


class EasySpatialAttention(nn.Module):
    dim: int
    inner_dim: int = 64
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        vs = Conv(self.inner_dim, (1, 1), use_bias=self.use_bias,
                  dtype=self.dtype, name="proj_v")(x)
        sa = Conv(self.inner_dim // 4, (1, 1), use_bias=True,
                  dtype=self.dtype, name="in_conv_0")(vs)
        sa = ChannelsLN(self.inner_dim // 4, name="in_conv_1")(sa)
        sa = nn.leaky_relu(sa, negative_slope=0.1)
        sa = Conv(1, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                  dtype=self.dtype, name="out_SA_0")(sa)
        sa = nn.sigmoid(sa)
        return Conv(self.dim, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, name="project_out")(vs * sa)


class EasyTransformerBlock(nn.Module):
    """4-norm easy block: ch-attn -> ch-ffn -> spatial-attn -> spatial-ffn."""

    dim: int
    inner_dim: int = 64
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ln = lambda name: RestormerLayerNorm(  # noqa: E731
            self.dim, self.bias_free_norm, name=name
        )
        x = x + EasyChannelAttention(
            self.dim, self.use_bias, self.dtype, name="channel_attn"
        )(ln("norm1")(x))
        x = x + EasyFeedForward(
            self.dim, self.expansion, self.use_bias, self.dtype,
            name="channel_ffn",
        )(ln("norm2")(x))
        x = x + EasySpatialAttention(
            self.dim, self.inner_dim, self.use_bias, self.dtype,
            name="spatial_attn",
        )(ln("norm3")(x))
        x = x + EasyFeedForward(
            self.dim, self.expansion, self.use_bias, self.dtype,
            name="spatial_ffn",
        )(ln("norm4")(x))
        return x


class EasyChannelTransformerBlock(nn.Module):
    """Easy channel-attn + easy ffn (prompt interaction in the Easy model)."""

    dim: int
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = RestormerLayerNorm(self.dim, self.bias_free_norm, name="norm1")(x)
        x = x + EasyChannelAttention(
            self.dim, self.use_bias, self.dtype, name="channel_attn"
        )(y)
        y = RestormerLayerNorm(self.dim, self.bias_free_norm, name="norm2")(x)
        x = x + EasyFeedForward(
            self.dim, self.expansion, self.use_bias, self.dtype,
            name="channel_ffn",
        )(y)
        return x


def local_avg_pool(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """TLC local average pooling (NHWC).

    Semantics of the TLC `AvgPool2d` that `Local_Base.convert` swaps in for
    the SCA's global pool (megvii NAFNet local_arch; imported-but-external in
    the reference, /root/reference/net/nafnet.py:19-20): valid-position
    window means via a zero-padded 2D integral image, replicate-padded back
    to the input's spatial size; falls back to the global mean when the
    kernel covers the whole map.
    """
    b, h, w, c = x.shape
    k1, k2 = min(int(kernel[0]), h), min(int(kernel[1]), w)
    if k1 >= h and k2 >= w:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    xf = x.astype(jnp.float32)
    s = jnp.cumsum(jnp.cumsum(xf, axis=1), axis=2)
    s = jnp.pad(s, ((0, 0), (1, 0), (1, 0), (0, 0)))
    out = (
        s[:, k1:, k2:] + s[:, :-k1, :-k2] - s[:, :-k1, k2:] - s[:, k1:, :-k2]
    ) / (k1 * k2)
    ph, pw = h - out.shape[1], w - out.shape[2]
    out = jnp.pad(
        out,
        ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
        mode="edge",
    )
    return out.astype(x.dtype)


class NAFBlock(nn.Module):
    """Simple Baselines block (nafnet.py:27-82).

    `tlc_kernel` enables the TLC local-pool SCA at inference (NAFNetLocal);
    the parameter tree is unchanged, so NAFNet weights load directly. TLC
    fixes the kernel at convert time from the *train-time* feature size at
    this pool's depth (`kernel = train_feat_shape * base // train_size` =
    base / 2^level, set once during the convert dry-run and never rescaled
    at test time), so the kernel is a static per-level constant here.
    """

    dim: int
    dw_expand: int = 2
    ffn_expand: int = 2
    dtype: jnp.dtype = jnp.float32
    tlc_kernel: "tuple | None" = None

    @nn.compact
    def __call__(self, inp):
        c = self.dim
        dw = c * self.dw_expand
        x = ChannelsLN(c, name="norm1")(inp)
        x = Conv(dw, (1, 1), use_bias=True, dtype=self.dtype, name="conv1")(x)
        x = Conv(dw, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=dw,
                 use_bias=True, dtype=self.dtype, name="conv2")(x)
        x = simple_gate(x)
        if self.tlc_kernel is not None:
            from promptir_tpu.parallel.spatial import (
                current_spatial_axis,
                gather_rows,
                slice_local_rows,
            )

            axis = current_spatial_axis()
            if axis is not None:
                # TLC windows are ~half-image sized — no local halo plan;
                # exact gather fallback (TLC is an inference-only path)
                pooled = slice_local_rows(
                    local_avg_pool(gather_rows(x, axis), self.tlc_kernel),
                    axis,
                )
            else:
                pooled = local_avg_pool(x, self.tlc_kernel)
        else:
            from promptir_tpu.parallel.spatial import global_mean_hw

            pooled = global_mean_hw(x)
        x = x * Conv(dw // 2, (1, 1), use_bias=True, dtype=self.dtype,
                     name="sca_1")(pooled)
        x = Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="conv3")(x)
        beta = self.param("beta", nn.initializers.zeros, (c,))
        y = inp + x * beta

        x = ChannelsLN(c, name="norm2")(y)
        x = Conv(c * self.ffn_expand, (1, 1), use_bias=True, dtype=self.dtype,
                 name="conv4")(x)
        x = simple_gate(x)
        x = Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="conv5")(x)
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        return y + x * gamma
