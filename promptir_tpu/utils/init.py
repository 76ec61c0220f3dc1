"""Weight initializers matching torch's Conv2d/Linear defaults.

torch initializes conv/linear weights with kaiming_uniform(a=sqrt(5)),
which reduces to uniform(-1/sqrt(fan_in), +1/sqrt(fan_in)). Matching this
keeps from-scratch training statistically equivalent to the reference
recipe (/root/reference/train.py uses torch defaults everywhere).

For flax kernels, fan_in = prod(shape[:-1]) covers both HWIO convs
(kh*kw*cin_per_group) and (in,out) dense kernels.
"""

from __future__ import annotations

import math

import jax


def torch_kernel_init(key, shape, dtype=jax.numpy.float32):
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _fans(shape):
    """(fan_in, fan_out) with torch's conv convention on HWIO/(-in,out)
    kernels: fan_in = cin_per_group * prod(kernel), fan_out = cout *
    prod(kernel)."""
    receptive = 1
    for d in shape[:-2]:
        receptive *= d
    return shape[-2] * receptive, shape[-1] * receptive


def init_weights(params, init_type: str = "normal", rng=None):
    """Re-initialize every conv/dense kernel of a flax params tree.

    Parity surface: the reference's init helper family
    (/root/reference/utils/image_utils.py:185-252 — `init_weights(net,
    'normal'|'xavier'|'kaiming'|'orthogonal')`; dead code in its main
    path, whose live init is the torch default `torch_kernel_init`
    above). Semantics per type, applied to leaves named 'kernel' with
    ndim >= 2 (biases and norm scales untouched, as in the reference):

      * normal:      U[0, 0.02)             (torch init.uniform(0, 0.02))
      * xavier:      N(0, 2/(fan_in+fan_out))        (xavier_normal g=1)
      * kaiming:     N(0, 2/fan_in)          (kaiming_normal a=0 fan_in)
      * orthogonal:  torch-style orthogonal over (fan_out, rest), gain 1

    Returns a new params tree; `rng` is a jax PRNGKey (default 0).
    """
    import jax.numpy as jnp

    if init_type not in ("normal", "xavier", "kaiming", "orthogonal"):
        raise NotImplementedError(
            f"initialization method [{init_type}] is not implemented"
        )
    rng = jax.random.PRNGKey(0) if rng is None else rng

    flat_items, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, len(flat_items))

    def reinit(key, path, leaf):
        name = str(path[-1].key) if path else ""
        if name != "kernel" or leaf.ndim < 2:
            return leaf
        shape, dtype = leaf.shape, leaf.dtype
        fan_in, fan_out = _fans(shape)
        if init_type == "normal":
            return jax.random.uniform(key, shape, dtype, 0.0, 0.02)
        if init_type == "xavier":
            std = math.sqrt(2.0 / (fan_in + fan_out))
            return std * jax.random.normal(key, shape, dtype)
        if init_type == "kaiming":
            std = math.sqrt(2.0 / fan_in)
            return std * jax.random.normal(key, shape, dtype)
        # orthogonal: torch flattens OIHW to (rows=out, cols=rest); build
        # that, orthogonalize, and lay it back out as HWIO/(in,out)
        rows, cols = shape[-1], fan_in
        a = jax.random.normal(
            key, (max(rows, cols), min(rows, cols)), jnp.float32
        )
        q, r = jnp.linalg.qr(a)
        q = q * jnp.sign(jnp.diagonal(r))[None, :]
        w = q if rows >= cols else q.T
        w = w[:rows, :cols]  # (out, rest = I*kh*kw)
        # (out, rest) -> torch OIHW -> our HWIO
        if leaf.ndim == 2:
            return w.T.astype(dtype)  # (in, out)
        kshape = (shape[-1], shape[-2]) + tuple(shape[:-2])  # O,I,kh,kw
        w = w.reshape(kshape)
        perm = tuple(range(2, leaf.ndim)) + (1, 0)  # -> kh,kw,I,O
        return jnp.transpose(w, perm).astype(dtype)

    new_leaves = [
        reinit(k, path, leaf)
        for k, (path, leaf) in zip(keys, flat_items)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
