"""CAMixer — content-aware dynamic-compute window mixing, NHWC/static-shape.

Parity targets:
  * PredictorLG v1 (offsets + channel/spatial gates,
    /root/reference/net/camixer_prompt_xrestormer_eff.py:300-373) and v2
    (mask + spatial gate only,
    /root/reference/net/camixer_prompt_xrestormer_effv2.py:325-401);
  * CAMixer v1 — window self-attention with deformable keys
    k = x + flow_warp(x, offsets), conv branch `act(conv_sptial(out))*ca +
    out` (eff.py:375-469);
  * CAMixer v2 — OCAB-flavored hard branch (overlapping k/v windows +
    RelPosEmb, multi-head) vs cheap `v*sa` easy branch (effv2.py:403-551);
  * BranchSelector — per-image hard/easy routing
    (ca_ta_promptxrestormer.py:317-357).

TPU re-expression of the routing (XLA needs static shapes):
  * TRAIN: dense masked blend with a straight-through Gumbel mask — this is
    exactly the reference's (commented-in-v1 / intended-in-v2) train path:
    per-window attention is window-local, so zeroing non-selected windows
    reproduces the sparse result bit-for-bit. Returns the mean decision for
    the ratio loss (effv2.py:932).
  * EVAL: the reference gathers a *data-dependent* number of windows
    (num_keep = min(N*mean(gumbel_mask)*2*ratio, N), eff.py:357-373) — both
    shape-dynamic and stochastic (Gumbel noise at eval). Here eval selects
    a *static* top-k of windows by the predictor score with
    k = N if ratio==1 else round(N*ratio) (the reference's expected keep
    count: the ratio loss drives mean(mask) -> 0.5, so E[num_keep] =
    N*ratio), applied as a hard mask over the dense blend. Deterministic,
    one compiled program, and exactly the reference when ratio == 1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from promptir_tpu.ops.conv import Conv, Dense
from promptir_tpu.ops.easy import ChannelsLN
from promptir_tpu.ops.flow_warp import flow_warp
from promptir_tpu.ops.ocab import RelPosEmb, extract_overlapping_windows


def gumbel_softmax_hard(rng, logits: jnp.ndarray, axis: int = -1):
    """torch F.gumbel_softmax(hard=True) — straight-through one-hot."""
    u = jax.random.uniform(
        rng, logits.shape, minval=1e-10, maxval=1.0 - 1e-10
    )
    g = -jnp.log(-jnp.log(u))
    y = jax.nn.softmax(logits + g, axis=axis)
    hard = jax.nn.one_hot(
        jnp.argmax(y, axis=axis), y.shape[axis], axis=axis, dtype=y.dtype
    )
    return hard + y - jax.lax.stop_gradient(y)


def topk_window_mask(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, N) scores -> (B, N) {0,1} mask keeping the top-k per batch."""
    n = scores.shape[-1]
    if k >= n:
        return jnp.ones_like(scores)
    thresh = jnp.sort(scores, axis=-1)[:, n - k][:, None]
    return (scores >= thresh).astype(scores.dtype)


def window_condition(b: int, h: int, w: int, win: int) -> jnp.ndarray:
    """The reference's per-window coordinate channels: a (win,win) grid of
    linspace(-1,1) coords tiled over the image (eff.py:410-412), NHWC."""
    lin = np.linspace(-1.0, 1.0, win, dtype=np.float32)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    tile = np.stack([gy, gx], axis=-1)  # torch stacks meshgrid(y-first)
    cond = np.tile(tile, (h // win, w // win, 1))
    return jnp.broadcast_to(jnp.asarray(cond)[None], (b, h, w, 2))


class PredictorLG(nn.Module):
    """Window-importance router. v1 (`with_offsets=True`) also emits
    deformable offsets and a channel gate."""

    dim: int
    window_size: int = 8
    k: int = 4
    with_offsets: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray):
        """cond: (B,H,W,dim+k). Returns dict with 'scores' (B,N,2 softmax),
        'sa' (B,H,W,1) and, for v1, 'offsets' (B,H,W,2) and 'ca' (B,1,1,dim).
        """
        win = self.window_size
        cdim = self.dim + self.k
        x = Conv(cdim // 4, (1, 1), use_bias=True, dtype=self.dtype,
                 name="in_conv_0")(cond)
        x = ChannelsLN(cdim // 4, name="in_conv_1")(x)
        x = nn.leaky_relu(x, negative_slope=0.1)

        out = {}
        if self.with_offsets:
            o = Conv(cdim // 8, (1, 1), use_bias=True, dtype=self.dtype,
                     name="out_offsets_0")(x)
            o = nn.leaky_relu(o, negative_slope=0.1)
            o = Conv(2, (1, 1), use_bias=True, dtype=self.dtype,
                     name="out_offsets_2")(o)
            out["offsets"] = jnp.tanh(o) * 8.0
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
            ca = Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype,
                      name="out_CA_1")(pooled)
            out["ca"] = nn.sigmoid(ca)

        sa = Conv(1, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                  dtype=self.dtype, name="out_SA_0")(x)
        out["sa"] = nn.sigmoid(sa)

        # window token: mean over channels, flattened per window
        b, h, w, _ = x.shape
        t = jnp.mean(x, axis=-1)  # (B,H,W)
        t = t.reshape(b, h // win, win, w // win, win)
        t = t.transpose(0, 1, 3, 2, 4).reshape(b, -1, win * win)
        s = Dense(win, use_bias=True, dtype=self.dtype, name="out_mask_0")(t)
        s = nn.leaky_relu(s, negative_slope=0.1)
        s = Dense(2, use_bias=True, dtype=self.dtype, name="out_mask_2")(s)
        out["scores"] = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        return out


def route_mask(
    scores: jnp.ndarray,
    ratio: float,
    deterministic: bool,
    rng: Optional[jax.Array],
) -> jnp.ndarray:
    """(B,N,2) scores -> (B,N,1) hard selection mask (ST-gumbel in train,
    static top-k capacity at eval)."""
    if deterministic:
        n = scores.shape[1]
        k = n if ratio >= 1.0 else max(1, int(round(n * ratio)))
        return topk_window_mask(scores[:, :, 0], k)[..., None]
    mask = gumbel_softmax_hard(rng, scores, axis=2)[:, :, 0:1]
    return mask


def _to_windows(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B, N, win*win, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, (h // win) * (w // win), win * win, c
    )


def _from_windows(x: jnp.ndarray, win: int, h: int, w: int) -> jnp.ndarray:
    b, n, p2, c = x.shape
    x = x.reshape(b, h // win, w // win, win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _sharded_gather_call(body, x, condition_global, deterministic):
    """Exact spatial-sharding fallback for the CAMixer mixers: the
    routers take per-window GLOBAL top-k decisions and flow_warp samples
    at unbounded offsets, so no local halo plan exists. Gather the
    level's rows, run the unsharded mixer, keep this shard's stripe; the
    scalar decision is computed on the gathered (global) windows and so
    is identical on every shard."""
    from promptir_tpu.parallel.spatial import (
        current_spatial_axis,
        gather_rows,
        slice_local_rows,
        spatial_sharding,
    )

    axis = current_spatial_axis()
    if axis is None or jax.lax.axis_size(axis) == 1:
        return body(x, condition_global, deterministic)
    xg = gather_rows(x, axis)
    cg = (
        None if condition_global is None
        else gather_rows(condition_global, axis)
    )
    with spatial_sharding(None):
        yg, dec = body(xg, cg, deterministic)
    return slice_local_rows(yg, axis), dec


class CAMixerV1(nn.Module):
    """Deformable-key window attention with routed hard/easy branches."""

    dim: int
    window_size: int = 8
    ratio: float = 0.5
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        condition_global: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        return _sharded_gather_call(
            self._body, x, condition_global, deterministic
        )

    def _body(self, x, condition_global, deterministic):
        b, h, w, c = x.shape
        win = self.window_size
        v = Conv(c, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
                 name="project_v")(x)

        cond = [v, window_condition(b, h, w, win).astype(v.dtype)]
        if condition_global is not None:
            cond.insert(1, condition_global.astype(v.dtype))
        cond = jnp.concatenate(cond, axis=-1)
        route = PredictorLG(
            c, win, k=cond.shape[-1] - c, with_offsets=True,
            dtype=self.dtype, name="route",
        )(cond)

        rng = None if deterministic else self.make_rng("gumbel")
        mask = route_mask(route["scores"], self.ratio, deterministic, rng)

        k_feat = x + flow_warp(x, route["offsets"])
        vs = v * route["sa"]

        vw = _to_windows(v, win)  # (B,N,p2,C)
        vsw = _to_windows(vs, win)
        qw = _to_windows(x, win)
        kw = _to_windows(k_feat, win)

        m = mask[..., None].astype(vw.dtype)  # (B,N,1,1)
        v1 = vw * m
        q1 = Dense(c, use_bias=self.use_bias, dtype=self.dtype,
                   name="project_q")(qw * m)
        k1 = Dense(c, use_bias=self.use_bias, dtype=self.dtype,
                   name="project_k")(kw * m)

        attn = jnp.einsum(
            "bnqc,bnkc->bnqk", q1, k1, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(attn, axis=-1)
        f_attn = jnp.einsum(
            "bnqk,bnkc->bnqc", attn.astype(v1.dtype), v1,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

        # reference blend: attn_out = f_attn + vs*(1-mask) — f_attn is
        # already zero on non-selected windows (their v was masked), and
        # keeping the single `m` factor matches the reference's
        # straight-through gradient path (eff.py:452)
        out_w = f_attn + vsw * (1.0 - m)
        out = _from_windows(out_w, win, h, w)

        y = Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                 use_bias=True, dtype=self.dtype, name="conv_sptial_0")(out)
        y = Conv(c, (3, 3), padding=((2, 2), (2, 2)), feature_group_count=c,
                 kernel_dilation=(2, 2), use_bias=True, dtype=self.dtype,
                 name="conv_sptial_1")(y)
        out = jax.nn.gelu(y, approximate=False) * route["ca"] + out
        out = Conv(c, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
                   name="project_out")(out)
        decision = jnp.mean(mask)
        return out, decision


class CAMixerV2(nn.Module):
    """OCAB-flavored hard branch vs `v*sa` easy branch, routed per window."""

    dim: int
    window_size: int = 8
    overlap_ratio: float = 0.5
    num_heads: int = 4
    dim_head: int = 16
    ratio: float = 0.5
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        condition_global: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        return _sharded_gather_call(
            self._body, x, condition_global, deterministic
        )

    def _body(self, x, condition_global, deterministic):
        b, h, w, c = x.shape
        win = self.window_size
        ow = int(win * self.overlap_ratio) + win
        inner = self.dim_head * self.num_heads
        nwin = (h // win) * (w // win)

        qs = Conv(inner, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
                  name="proj_q")(x)
        ks = Conv(inner, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
                  name="proj_k")(x)
        vs = Conv(inner, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
                  name="proj_v")(x)

        cond = [vs, window_condition(b, h, w, win).astype(vs.dtype)]
        if condition_global is not None:
            cond.insert(1, condition_global.astype(vs.dtype))
        cond = jnp.concatenate(cond, axis=-1)
        route = PredictorLG(
            inner, win, k=cond.shape[-1] - inner, with_offsets=False,
            dtype=self.dtype, name="route",
        )(cond)

        rng = None if deterministic else self.make_rng("gumbel")
        mask = route_mask(route["scores"], self.ratio, deterministic, rng)

        v_easy = vs * route["sa"]

        # hard branch: overlapping cross-attention over all windows (dense)
        qw = _to_windows(qs, win)  # (B,N,p2,inner)
        kw = extract_overlapping_windows(ks, win, ow)
        vw = extract_overlapping_windows(vs, win, ow)

        d = self.dim_head
        hd = self.num_heads
        dtype = qw.dtype

        def heads(t, m_):
            return t.reshape(b, nwin, m_, hd, d)

        qh = heads(qw, win * win) * jnp.asarray(d ** -0.5, dtype)
        kh = heads(kw, ow * ow)
        vh = heads(vw, ow * ow)

        attn = jnp.einsum(
            "bwqhd,bwkhd->bwhqk", qh, kh, preferred_element_type=jnp.float32
        )
        q_flat = qh.transpose(0, 1, 3, 2, 4).reshape(
            b * nwin * hd, win * win, d
        )
        bias = RelPosEmb(win, ow, d, name="rel_pos_emb")(q_flat)
        attn = attn + bias.reshape(b, nwin, hd, win * win, ow * ow)
        attn = jax.nn.softmax(attn, axis=-1)
        hard = jnp.einsum(
            "bwhqk,bwkhd->bwqhd", attn.astype(dtype), vh,
            preferred_element_type=jnp.float32,
        )
        hard = hard.reshape(b, nwin, win * win, inner).astype(x.dtype)

        easy_w = _to_windows(v_easy, win)
        m = mask[..., None].astype(hard.dtype)
        out = _from_windows(hard * m + easy_w * (1.0 - m), win, h, w)
        out = Conv(self.dim, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
                   name="project_out")(out)
        return out, jnp.mean(mask)


class BranchSelector(nn.Module):
    """Per-image hard/easy router (ca_ta_promptxrestormer.py:317-357).

    Train: straight-through Gumbel over the batch axis (reference
    semantics). Eval: the reference argsorts *post-Gumbel* labels
    (stochastic); here eval deterministically keeps the top
    int(B*hard_ratio) images by classifier score.
    """

    dim: int
    hard_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        b = x.shape[0]
        y = Conv(self.dim // 4, (1, 1), use_bias=True, dtype=self.dtype,
                 name="in_conv_0")(x)
        y = ChannelsLN(self.dim // 4, name="in_conv_1")(y)
        y = nn.leaky_relu(y, negative_slope=0.1)
        # global over (H, W): pmean under a spatial-sharding trace so the
        # per-image routing scores are replicated-identical on every shard
        from promptir_tpu.parallel.spatial import global_mean_hw

        pooled = global_mean_hw(y)
        z = Conv(self.dim // 4, (1, 1), use_bias=False, dtype=self.dtype,
                 name="se_1")(pooled)
        z = nn.leaky_relu(z, negative_slope=0.1)
        z = Conv(self.dim // 4, (1, 1), use_bias=False, dtype=self.dtype,
                 name="se_3")(z)
        z = jnp.mean(z, axis=(1, 2))  # (B, dim//4)
        label = nn.sigmoid(
            Dense(1, use_bias=True, dtype=self.dtype, name="classifier_0")(z)
        ).astype(jnp.float32)  # (B,1)

        if deterministic:
            k = max(1, int(round(b * self.hard_ratio)))
            return topk_window_mask(label.T, k).T[:, 0]  # (B,)
        rng = self.make_rng("gumbel")
        return gumbel_softmax_hard(rng, label, axis=0)[:, 0]  # (B,)
