"""EXACT spatially-sharded model forward — in-model collectives.

`parallel/halo.py` shards the H axis and exchanges a fixed input halo;
that is exact only for purely local (conv) models. The PromptIR family is
NOT local: MDTA's attention statistics are global over the spatial axis
(the q/k L2 norms and the channel-Gram contraction sum over every pixel,
ops/attention.py), and PromptGenBlock starts from a global average pool.
The reference sidesteps the question by running whole images on one GPU
(and tiling is itself inexact, /root/reference/demo.py:26-48).

The TPU-native answer is a sharding-aware forward: run the UNMODIFIED
flax model under `shard_map` with a trace-time context that makes each op
handle its own distribution —

  * stride-1 spatial convs (3x3 dw/qkv/embed/output) exchange a
    `kh//2`-row halo with mesh neighbors over ICI (`ppermute`) and crop
    the recomputed boundary rows: bit-exact vs the unsharded zero-pad;
  * MDTA's L2-norm sums and channel-Gram matrix are computed over the
    local rows and `psum`med — the softmaxed attention matrix is then
    replicated-exact on every shard;
  * PromptGenBlock's GAP becomes a `pmean`; the (tiny) prompt-bank mix is
    computed replicated, bilinearly resized at GLOBAL row coordinates and
    sliced to the local stripe;
  * pixel-(un)shuffle resampling stays local (stripe heights must stay
    even through every level — hence the H % (n * 8) requirement for the
    4-level U-Net);
  * the Uformer family's shifted windows roll the sharded H axis with a
    ring ppermute (global torch.roll semantics, `sharded_roll_h`) and
    take per-shard row slices of the GLOBAL Swin boundary mask; its
    4x4/s2 downsamples use a strided halo plan (ops/conv.py), and deep
    levels whose stripes are thinner than a window run gathered
    (`gather_rows` -> exact unsharded block -> `slice_local_rows`).

Total communication per forward: 2 halo rows per spatial conv plus a few
KB of psummed statistics — all ICI, no host round-trips, one XLA program.

Requires the unfused op path (`fused_ffn=False`); the Pallas kernels are
single-chip.
"""

from __future__ import annotations

import math

from contextlib import contextmanager
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_SPATIAL_AXIS: Optional[str] = None


def current_spatial_axis() -> Optional[str]:
    """The mesh axis name the forward is being traced under, or None."""
    return _SPATIAL_AXIS


@contextmanager
def spatial_sharding(axis: str):
    """Activate sharded tracing: ops consult `current_spatial_axis()`."""
    global _SPATIAL_AXIS
    prev = _SPATIAL_AXIS
    _SPATIAL_AXIS = axis
    try:
        yield
    finally:
        _SPATIAL_AXIS = prev


def exchange_rows(x: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Pad a local (B, h, W, C) stripe with `halo` boundary rows from the
    previous/next shard (zeros at the global borders, matching SAME-conv
    zero padding). Returns (B, h + 2*halo, W, C)."""
    from promptir_tpu.parallel.halo import exchange_halo

    return exchange_halo(x, halo, axis, border="zeros")


def sharded_roll_h(x: jnp.ndarray, shift: int, axis: str) -> jnp.ndarray:
    """GLOBAL cyclic roll along the sharded H axis of a local (B,h,W,C)
    stripe — the distributed equivalent of `jnp.roll(x_global, shift,
    axis=1)` (torch.roll semantics, wrap-around included: the ring
    ppermute wraps shard n-1 to shard 0 exactly like the global roll).
    One |shift|-row slab over ICI per shard pair."""
    if shift == 0:
        return x
    n = jax.lax.axis_size(axis)
    if n == 1:
        return jnp.roll(x, shift, axis=1)
    s = abs(shift)
    assert s <= x.shape[1], "roll larger than the local stripe"
    if shift < 0:
        # rows move up: my top rows become the previous shard's bottom
        recv = jax.lax.ppermute(
            x[:, :s], axis, [(i, (i - 1) % n) for i in range(n)]
        )
        return jnp.concatenate([x[:, s:], recv], axis=1)
    recv = jax.lax.ppermute(
        x[:, -s:], axis, [(i, (i + 1) % n) for i in range(n)]
    )
    return jnp.concatenate([recv, x[:, :-s]], axis=1)


def gather_rows(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """all_gather the local (B,h,W,C) stripes into the full (B,H,W,C) —
    the exact (communication-heavy) fallback for ops whose local stripe
    cannot satisfy their spatial structure (e.g. a window-attention level
    whose stripe is smaller than the window)."""
    return jax.lax.all_gather(x, axis, axis=1, tiled=True)


def slice_local_rows(xg: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Inverse of gather_rows: this shard's stripe of a global tensor."""
    n = jax.lax.axis_size(axis)
    hl = xg.shape[1] // n
    return jax.lax.dynamic_slice_in_dim(
        xg, jax.lax.axis_index(axis) * hl, hl, axis=1
    )


def sharded_resize_bilinear(
    x: jnp.ndarray,
    out_hw_global: tuple,
    axis: str,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear resize of an H-sharded NHWC stripe at GLOBAL coordinates
    (bilinear samples cross stripe seams): all_gather the rows — cheap
    for the few-channel maps this is used on (RGB inputs, 2-channel
    condition maps) — resize the global tensor, keep this shard's output
    stripe. The global output height must divide the axis size."""
    from promptir_tpu.ops.resize import resize_bilinear

    xg = gather_rows(x, axis)
    yg = resize_bilinear(xg, out_hw_global, align_corners=align_corners)
    if yg.shape[1] % jax.lax.axis_size(axis):
        raise NotImplementedError(
            f"sharded resize: output rows {yg.shape[1]} do not partition "
            "the mesh axis"
        )
    return slice_local_rows(yg, axis)


def upscale_input(inp_img: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bilinear x`scale` input upscaling (the X-Restormer SR entry,
    align_corners=False — /root/reference/net/camixer_prompt_xrestormer_eff.py:747-748), exact
    under a spatial-sharding trace: bilinear samples cross stripe seams,
    so the (cheap, 3-channel) input is resized at GLOBAL coordinates and
    re-sliced. No-op at scale 1."""
    if scale <= 1:
        return inp_img
    from promptir_tpu.ops.resize import resize_bilinear

    _, h, w, _ = inp_img.shape
    axis = current_spatial_axis()
    if axis is not None:
        n = jax.lax.axis_size(axis)
        return sharded_resize_bilinear(
            inp_img, (h * n * scale, w * scale), axis
        )
    return resize_bilinear(
        inp_img, (h * scale, w * scale), align_corners=False
    )


def global_mean_hw(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """Mean over (H, W) of an NHWC tensor that stays GLOBAL under a
    spatial-sharding trace (equal stripes -> pmean of local means). The
    one-liner every GAP/SCA-style op should use instead of jnp.mean."""
    m = jnp.mean(x, axis=(1, 2), keepdims=keepdims)
    axis = current_spatial_axis()
    if axis is not None:
        m = jax.lax.pmean(m, axis)
    return m


def local_rows(h_global: int, axis: str) -> tuple[jnp.ndarray, int]:
    """(start_row, rows_per_shard) of this shard's stripe."""
    n = jax.lax.axis_size(axis)
    h_local = h_global // n
    return jax.lax.axis_index(axis) * h_local, h_local


def spatial_sharded_apply(
    model_fn: Callable,
    params,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Bit-exact multi-chip forward of one (batch of) image(s).

    `model_fn(params, x_nhwc)` is the plain single-chip forward (built
    with `fused_ffn=False`); `x` is the global (B, H, W, C) input with
    H divisible by `8 * mesh.shape[axis]` (stripe heights stay even
    through 3 pixel-unshuffle levels). Parameters are replicated; the H
    axis is sharded; every cross-shard dependency is handled inside the
    ops via `current_spatial_axis()`.
    """
    n = mesh.shape[axis]
    _, h, _, _ = x.shape
    assert h % (8 * n) == 0, (
        f"H={h} must be divisible by 8 * {axis}-axis size {n} "
        "(even stripes through 3 downsample levels)"
    )

    def shard_fn(p, xs):
        with spatial_sharding(axis):
            return model_fn(p, xs)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    xg = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
    pg = jax.device_put(params, NamedSharding(mesh, P()))
    return fn(pg, xg)


# --- pre-padding constraints per model family -------------------------
# Full-image inference needs H and W padded so every U-Net level's grid
# stays window-aligned (all families use 8x8 spatial windows) and, under
# H-sharding, so every shard's stripe stays even through the downsamples.
# With n = 1 these are also the single-chip demo pad bases (the
# reference's pad-to-8, demo.py:17-24, only covers window-free PromptIR).
_OCAB_FAMILIES = frozenset(
    {"xrestormerir", "promptxrestormerir", "promptxrestormereffir"}
)
_CAMIXER_XR_FAMILIES = frozenset(
    {"capromptxrestormereff", "capromptxrestormereffv2",
     "catapromptxrestormer"}
)
_UFORMER_FAMILIES = frozenset({"promptuformerir", "capromptuformerir"})


def pad_bases(model_name: str, n_shards: int = 1) -> tuple[int, int]:
    """(base_h, base_w) to pre-pad an image for `model_name` before
    full-image inference over `n_shards` H-stripes (1 = single chip).

    * X-Restormer skeletons run 8x8 windows (OCAB or CAMixer) at all four
      levels: both dims must be multiples of 8*2^3 = 64. Sharded OCAB
      additionally windows each shard's stripe locally (ops/ocab.py), so
      H must make the level-3 stripe H/(8n) window-aligned: H % 64n.
      CAMixer routes globally via gather, so only stripe evenness (8n)
      compounds with the global 64.
    * Uformer skeletons have four downsamples (grids to H/16): 128, with
      H additionally a multiple of 16n for even stripes.
    * Window-free families (PromptIR, Easy, NAFNet) need only even
      stripes through 3 downsamples: 8n, and the reference's 8 on W.
    """
    n = int(n_shards)
    if model_name in _UFORMER_FAMILIES:
        return math.lcm(128, 16 * n), 128
    if model_name in _OCAB_FAMILIES:
        return 64 * n, 64
    if model_name in _CAMIXER_XR_FAMILIES:
        return math.lcm(64, 8 * n), 64
    return 8 * n, 8
