"""Golden fixtures for the X-Restormer family (OCAB, X-block, models).

Usage: python tools/gen_goldens_xrestormer.py
"""

import sys

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/reference")

import ref_stubs

ref_stubs.install()

import numpy as np
import torch

from net import xrestormer as xr
from net import prompt_xrestormer as pxr
from net import prompt_xrestormer_eff as pxre

OUT = "tests/goldens"


def dump(name, module, x, quantize=False):
    """With quantize=True, weights are rounded to fp16 (and stored as fp16)
    BEFORE the forward, so the fixture halves in size while the comparison
    stays exact: both the oracle and the tested impl use identical values."""
    module = module.eval().float()
    if quantize:
        sd = {k: v.half().float() for k, v in module.state_dict().items()}
        module.load_state_dict(sd)
    with torch.no_grad():
        y = module(torch.from_numpy(x))
    payload = {"x": x, "y": y.numpy()}
    for k, v in module.state_dict().items():
        payload[f"sd::{k}"] = v.half().numpy() if quantize else v.numpy()
    np.savez_compressed(f"{OUT}/{name}.npz", **payload)
    print(f"{name}: x{x.shape} -> y{tuple(y.shape)}  "
          f"({sum(v.numel() for v in module.state_dict().values())} params)")


def main():
    g = torch.Generator().manual_seed(100)

    def randn(*shape):
        return torch.randn(*shape, generator=g).numpy().astype(np.float32)

    torch.manual_seed(101)
    dump(
        "ocab",
        xr.OCAB(dim=48, window_size=8, overlap_ratio=0.5, num_heads=2,
                dim_head=16, bias=False),
        randn(2, 48, 16, 24),
    )
    torch.manual_seed(102)
    dump(
        "xblock",
        xr.TransformerBlock(
            dim=48, window_size=8, overlap_ratio=0.5, num_channel_heads=2,
            num_spatial_heads=2, spatial_dim_head=16,
            ffn_expansion_factor=2.66, bias=False, LayerNorm_type="WithBias",
        ),
        randn(1, 48, 16, 16),
    )
    torch.manual_seed(103)
    dump(
        "xrestormer_small",
        xr.XRestormer(
            dim=48, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
            channel_heads=[1, 2, 4, 8], spatial_heads=[2, 2, 3, 4],
        ),
        randn(1, 3, 64, 64),
        quantize=True,
    )
    torch.manual_seed(104)
    dump(
        "prompt_xblock",
        pxr.PromptBlock(
            window_size=8, overlap_ratio=0.5, num_channel_heads=1,
            num_spatial_heads=2, spatial_dim_head=16,
            ffn_expansion_factor=2.66, bias=False, LayerNorm_type="WithBias",
            prompt_dim=32, prompt_len=5, prompt_size=16, lin_dim=48,
        ),
        randn(1, 48, 16, 16),
    )
    torch.manual_seed(105)
    dump(
        "prompt_xrestormer_small",
        pxr.PromptXRestormer(
            dim=48, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
            channel_heads=[1, 2, 4, 8], spatial_heads=[2, 2, 3, 4],
        ),
        randn(1, 3, 64, 64),
        quantize=True,
    )
    torch.manual_seed(106)
    dump(
        "prompt_xrestormer_eff_small",
        pxre.PromptXRestormerEff(
            dim=48, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
            channel_heads=[1, 2, 4, 8], spatial_heads=[2, 2, 3, 4],
        ),
        randn(1, 3, 64, 64),
        quantize=True,
    )


if __name__ == "__main__":
    main()
