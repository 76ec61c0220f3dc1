"""Tensor parallelism for the block matmuls (megatron-style, gate-aware).

The reference has no TP (its only strategy is DDP, train.py:339); SURVEY
§2.7 lists channel sharding of MDTA/GDFN as the optional TP row. This
module implements it the TPU way for both halves of the TransformerBlock
under `shard_map` over a `model` mesh axis — GDFN's project_in /
project_out matmul pair, and MDTA head-parallel (column-parallel qkv,
chip-local L2 norms / Gram / softmax / attention-apply per head slab,
row-parallel out-projection). For GDFN:

  * column-parallel W1 with a GATE-AWARE split: W1's output columns are
    [x1-half | x2-half] and `gelu(x1) * x2` pairs column i with i + F, so
    each chip takes the SAME slice of both halves — the gate (and the
    depthwise 3x3, which is per-channel) stays chip-local with zero
    communication;
  * row-parallel W2: each chip contracts its F/n hidden slice and the
    partial outputs are summed with one `psum` over ICI — the single
    collective of the whole FFN.

Weights stay in the flax checkpoint layout; `shard_gdfn_params` slices
them per chip (a host-side relayout, not a redefinition), so TP composes
with the existing converter and checkpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_gdfn_params(gdfn_params: dict, n: int) -> dict:
    """Split a GDFN param subtree {project_in, dwconv, project_out} into n
    gate-aware shards stacked on a leading axis (shard k holds x1 columns
    [k*F/n, (k+1)*F/n) AND the matching x2 columns). Biases (use_bias=True
    GDFNs) ride along: project_in/dwconv biases take the same column split
    as their kernels; the project_out bias is replicated and added once
    after the psum (zeros when the module is bias-free)."""
    w1 = gdfn_params["project_in"]["kernel"]  # (1,1,C,2F) conv kernel
    wdw = gdfn_params["dwconv"]["kernel"]  # (3,3,1,2F) depthwise
    w2 = gdfn_params["project_out"]["kernel"]  # (1,1,F,C)
    b1 = gdfn_params["project_in"].get("bias", jnp.zeros(w1.shape[-1]))
    bdw = gdfn_params["dwconv"].get("bias", jnp.zeros(wdw.shape[-1]))
    b2 = gdfn_params["project_out"].get("bias", jnp.zeros(w2.shape[-1]))
    two_f = w1.shape[-1]
    f = two_f // 2
    # the reference's F = int(2.66*dim) (127/255/510...) rarely divides n:
    # pad the hidden with inert zero columns (gelu(0)*0 through zero W2
    # rows adds exactly nothing) so every chip gets an equal slice
    fp = -(-f // n) * n
    fs = fp // n

    def pad_cols(w):
        cfg = [(0, 0)] * (w.ndim - 1) + [(0, fp - f)]
        return jnp.pad(w, cfg)

    def split_half_pair(w, axis):
        x1 = pad_cols(jnp.moveaxis(w, axis, -1)[..., :f])
        x2 = pad_cols(jnp.moveaxis(w, axis, -1)[..., f:])
        shards = [
            jnp.concatenate(
                [x1[..., k * fs : (k + 1) * fs], x2[..., k * fs : (k + 1) * fs]],
                axis=-1,
            )
            for k in range(n)
        ]
        return jnp.stack([jnp.moveaxis(s, -1, axis) for s in shards])

    w1_s = split_half_pair(w1, -1)  # (n,1,1,C,2*fs)
    wdw_s = split_half_pair(wdw, -1)  # (n,3,3,1,2*fs)
    w2_p = jnp.pad(w2, ((0, 0),) * (w2.ndim - 2) + ((0, fp - f), (0, 0)))
    w2_s = jnp.stack(
        [w2_p[..., k * fs : (k + 1) * fs, :] for k in range(n)]
    )  # (n,1,1,fs,C)
    return {
        "w1": w1_s, "wdw": wdw_s, "w2": w2_s,
        "b1": split_half_pair(b1, -1),  # (n, 2*fs)
        "bdw": split_half_pair(bdw, -1),  # (n, 2*fs)
        "b2": jnp.broadcast_to(b2, (n,) + b2.shape),  # replicated
    }


def _gdfn_shard_fn(shard, x, axis):
    """One chip's slice of GDFN(x): local matmuls + dwconv + gate, one
    psum for the row-parallel output contraction; the replicated output
    bias is added after the psum (once, exactly)."""
    w1 = shard["w1"][0]
    wdw = shard["wdw"][0]
    w2 = shard["w2"][0]
    two_fs = w1.shape[-1]
    fs = two_fs // 2
    y = jax.lax.conv_general_dilated(
        x, w1, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + shard["b1"][0]
    y = jax.lax.conv_general_dilated(
        y, wdw, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=two_fs,
    ) + shard["bdw"][0]
    y1, y2 = y[..., :fs], y[..., fs:]
    y = jax.nn.gelu(y1, approximate=False) * y2
    out = jax.lax.conv_general_dilated(
        y, w2, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.lax.psum(out, axis) + shard["b2"][0]


def shard_mdta_params(mdta_params: dict, n: int, num_heads: int) -> dict:
    """Split an MDTA param subtree {qkv, qkv_dwconv, temperature,
    project_out} into n HEAD-parallel shards stacked on a leading axis.

    The qkv 1x1 kernel's output columns are [q(C) | k(C) | v(C)] and head
    h owns channel slab [h*d, (h+1)*d) of each (ops/attention.py:50-53),
    so chip k takes the matching slab of all three — the L2 norms, the
    per-head Gram matrix, the softmax and the attention-apply are then
    chip-local. project_out is row-parallel (one psum)."""
    assert num_heads % n == 0, (
        f"heads {num_heads} must divide the model axis {n}"
    )
    wqkv = mdta_params["qkv"]["kernel"]  # (1,1,C,3C)
    wdw = mdta_params["qkv_dwconv"]["kernel"]  # (3,3,1,3C)
    temp = mdta_params["temperature"]  # (heads,)
    wout = mdta_params["project_out"]["kernel"]  # (1,1,C,C)
    bqkv = mdta_params["qkv"].get("bias", jnp.zeros(wqkv.shape[-1]))
    bdw = mdta_params["qkv_dwconv"].get("bias", jnp.zeros(wdw.shape[-1]))
    bout = mdta_params["project_out"].get("bias", jnp.zeros(wout.shape[-1]))
    c = wqkv.shape[-1] // 3
    cs = c // n
    hs = num_heads // n

    def split_qkv_cols(w):
        q, k, v = jnp.split(jnp.moveaxis(w, -1, 0), 3, axis=0)
        shards = [
            jnp.concatenate(
                [t[k_ * cs : (k_ + 1) * cs] for t in (q, k, v)], axis=0
            )
            for k_ in range(n)
        ]
        return jnp.stack([jnp.moveaxis(s, 0, -1) for s in shards])

    return {
        "wqkv": split_qkv_cols(wqkv),  # (n,1,1,C,3*cs)
        "wdw": split_qkv_cols(wdw),  # (n,3,3,1,3*cs)
        "temp": temp.reshape(n, hs),
        "wout": jnp.stack(
            [wout[..., k_ * cs : (k_ + 1) * cs, :] for k_ in range(n)]
        ),  # (n,1,1,cs,C)
        "bqkv": split_qkv_cols(bqkv),  # (n, 3*cs)
        "bdw": split_qkv_cols(bdw),  # (n, 3*cs)
        "bout": jnp.broadcast_to(bout, (n,) + bout.shape),  # replicated
    }


def _mdta_shard_fn(shard, x, heads_per_shard, axis):
    """One chip's heads of MDTA(x): local qkv/dwconv/attention on its
    channel slab, row-parallel out-projection with one psum; the
    replicated output bias is added after the psum (once, exactly)."""
    from promptir_tpu.ops.attention import channel_attention

    wqkv = shard["wqkv"][0]
    wdw = shard["wdw"][0]
    temp = shard["temp"][0]
    wout = shard["wout"][0]
    three_cs = wqkv.shape[-1]
    cs = three_cs // 3
    y = jax.lax.conv_general_dilated(
        x, wqkv, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + shard["bqkv"][0]
    y = jax.lax.conv_general_dilated(
        y, wdw, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=three_cs,
    ) + shard["bdw"][0]
    q, k, v = jnp.split(y, 3, axis=-1)
    out = channel_attention(q, k, v, temp, heads_per_shard)
    out = jax.lax.conv_general_dilated(
        out, wout, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.lax.psum(out, axis) + shard["bout"][0]


def prepare_tp_mdta(
    mdta_params: dict,
    num_heads: int,
    mesh: Mesh,
    axis: str = "model",
):
    """Shard + place the MDTA params once; returns `apply(x) -> y`.

    The host-side relayout (shard_mdta_params) and the device_put of the
    weight shards happen here, not per forward — call this once per
    (params, mesh) and reuse the returned closure for every input."""
    n = mesh.shape[axis]
    hs = num_heads // n
    ss = jax.device_put(
        shard_mdta_params(mdta_params, n, num_heads),
        NamedSharding(mesh, P(axis)),
    )
    fn = jax.shard_map(
        lambda s, t: _mdta_shard_fn(s, t, hs, axis),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )

    def apply(x: jnp.ndarray) -> jnp.ndarray:
        return fn(ss, jax.device_put(x, NamedSharding(mesh, P())))

    return apply


def tp_mdta_apply(
    mdta_params: dict,
    x: jnp.ndarray,
    num_heads: int,
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """MDTA forward with the heads sharded over `axis` (megatron-style:
    column-parallel qkv, chip-local attention, row-parallel out-proj with
    one psum). Numerically identical to the MDTA module up to psum
    reassociation; input/output replicated over `axis`. One-shot
    convenience — for repeated calls use prepare_tp_mdta."""
    return prepare_tp_mdta(mdta_params, num_heads, mesh, axis)(x)


def prepare_tp_gdfn(
    gdfn_params: dict,
    mesh: Mesh,
    axis: str = "model",
):
    """Shard + place the GDFN params once; returns `apply(x) -> y`.

    Same prepare-once/apply-many contract as prepare_tp_mdta: the weight
    relayout and transfer cost is paid here, not per forward."""
    ss = jax.device_put(
        shard_gdfn_params(gdfn_params, mesh.shape[axis]),
        NamedSharding(mesh, P(axis)),
    )
    fn = jax.shard_map(
        lambda s, t: _gdfn_shard_fn(s, t, axis),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )

    def apply(x: jnp.ndarray) -> jnp.ndarray:
        return fn(ss, jax.device_put(x, NamedSharding(mesh, P())))

    return apply


def tp_gdfn_apply(
    gdfn_params: dict,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """GDFN forward with the hidden dimension sharded over `axis`.

    Numerically identical (up to psum reassociation) to the GDFN module's
    forward with the same params; the input/output stay replicated over
    `axis` (compose with batch sharding on the other mesh axis for 2-D
    DP x TP). One-shot convenience — for repeated calls use
    prepare_tp_gdfn."""
    return prepare_tp_gdfn(gdfn_params, mesh, axis)(x)
