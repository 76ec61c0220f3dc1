"""PyTorch / Lightning checkpoint -> flax param-pytree converter.

Maps the reference state-dict layout (e.g. the released all-in-one PromptIR
checkpoint, /root/reference/ckpt/README.md:1; Lightning prefixes keys with
`net.` — /root/reference/train.py:31) onto this framework's NHWC flax
modules. Pure numpy: no torch import is needed if the state dict is already
{key: ndarray}; `.ckpt`/`.pt` files are loaded with torch when available.

Layout transforms:
  * conv weights OIHW -> HWIO (works for grouped/depthwise too, since torch
    stores (O, I/g, kH, kW) and flax expects (kH, kW, I/g, O));
  * linear weights (out, in) -> (in, out);
  * MDTA `temperature` (heads,1,1) -> (heads,);
  * prompt banks (1, L, C, S, S) -> (L, S, S, C);
  * Sequential stacks `stack.<i>.` -> `stack_<i>.`; `norm*.body.*` drops the
    `body` wrapper; `down*/up*.body.0.weight` drops the Sequential index.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .ckpt/.pt/.pth file into {key: float ndarray}."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, Mapping) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def _strip_prefix(key: str) -> str:
    for pref in ("net.", "module.", "model."):
        if key.startswith(pref):
            return key[len(pref):]
    return key


def convert_state_dict(
    state_dict: Mapping[str, Any], strict: bool = True
) -> Dict[str, Any]:
    """Convert a torch state dict to a nested flax params dict.

    Returns the `{'params': ...}` variables dict expected by module.apply.
    """
    tree: Dict[str, Any] = {}
    for raw_key, value in state_dict.items():
        key = _strip_prefix(raw_key)
        raw_arr = np.asarray(value)
        if raw_arr.dtype.kind in "iu" or key.endswith("relative_position_index"):
            # integer buffers (e.g. relative_position_index) are static
            # lookup tables recomputed by the modules — not parameters
            continue
        arr = raw_arr.astype(np.float32)
        parts = key.split(".")

        # Sequential stack index: "encoder_level1.0.attn..." -> merge.
        # Merge Sequential/ModuleList indices into the preceding name
        # ("encoder_level1.0.attn" -> "encoder_level1_0.attn",
        #  "encoders.0.1.conv1" -> "encoders_0_1.conv1") and drop the
        # LayerNorm `body` wrapper ("norm1.body.weight" -> "norm1.weight";
        # `body` followed by an index is a real Sequential -> "body_0").
        merged = []
        for i, p in enumerate(parts):
            if (
                p == "body"
                and not (i + 1 < len(parts) and parts[i + 1].isdigit())
            ):
                continue
            if p.isdigit() and merged and i < len(parts) - 1:
                merged[-1] = f"{merged[-1]}_{p}"
            else:
                merged.append(p)
        parts = merged

        leaf = parts[-1]
        # Uformer specials:
        #  * modulator/cross_modulator embeddings stay (N, dim) untransposed
        if len(parts) >= 2 and parts[-2] in ("modulator", "cross_modulator"):
            node = tree
            for p in parts[:-2]:
                node = node.setdefault(p, {})
            node[parts[-2]] = arr
            continue
        #  * transposed conv (in,out,kh,kw) -> (in,kh,kw,out) flat params
        #    (torch Sequential "deconv.0" merges to "deconv_0")
        if len(parts) >= 2 and parts[-2] in ("deconv", "deconv_0"):
            if leaf == "weight":
                arr = arr.transpose(0, 2, 3, 1)
                new_leaf = "deconv_kernel"
            else:
                new_leaf = "deconv_bias"
            node = tree
            for p in parts[:-2]:
                node = node.setdefault(p, {})
            node[new_leaf] = arr
            continue
        if leaf == "weight":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                arr = arr.transpose(2, 3, 1, 0)
                parts[-1] = "kernel"
            elif arr.ndim == 2:  # linear (out,in) -> (in,out)
                arr = arr.T
                parts[-1] = "kernel"
            # ndim == 1: layernorm weight, keep name 'weight'
        elif leaf == "temperature" and arr.ndim == 3:
            arr = arr.reshape(arr.shape[0])
        elif leaf in ("beta", "gamma") and arr.ndim == 4:
            arr = arr.reshape(-1)  # NAFBlock (1,C,1,1) scales -> (C,)
        elif leaf == "prompt_param" and arr.ndim == 5:
            arr = arr[0].transpose(0, 2, 3, 1)  # (L,C,S,S)->(L,S,S,C)

        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if parts[-1] in node and strict:
            raise ValueError(f"duplicate param path for {raw_key}")
        node[parts[-1]] = arr
    return {"params": tree}


def check_params_match(converted: Dict[str, Any], initialized: Any) -> None:
    """Raise with a readable diff if trees have mismatched paths/shapes."""
    import jax

    c = {
        "/".join(str(k.key) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    g = {
        "/".join(str(k.key) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(initialized)[0]
    }
    missing = sorted(set(g) - set(c))
    extra = sorted(set(c) - set(g))
    bad = sorted(
        k for k in set(c) & set(g) if tuple(c[k]) != tuple(g[k])
    )
    if missing or extra or bad:
        msg = []
        if missing:
            msg.append(f"missing from checkpoint ({len(missing)}): {missing[:8]}")
        if extra:
            msg.append(f"unexpected in checkpoint ({len(extra)}): {extra[:8]}")
        if bad:
            msg.append(
                "shape mismatches: "
                + ", ".join(f"{k}: ckpt{c[k]} vs model{g[k]}" for k in bad[:8])
            )
        raise ValueError("; ".join(msg))
