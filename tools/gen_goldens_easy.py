"""Golden fixtures for Easy/NAF blocks, EasyPromptXRestormer, and NAFNet.

Usage: python tools/gen_goldens_easy.py
"""

import sys

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/reference")

import ref_stubs

ref_stubs.install()

import numpy as np
import torch

from net import easy_promptxrestormer as ez
from net import nafnet as nf

OUT = "tests/goldens"


def dump(name, module, x, quantize=False):
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
    g = torch.Generator().manual_seed(300)

    def randn(*shape):
        return torch.randn(*shape, generator=g).numpy().astype(np.float32)

    torch.manual_seed(301)
    dump("easy_block",
         ez.EasyTransformerBlock(dim=48, num_channel_heads=1,
                                 ffn_expansion_factor=2.66, bias=False,
                                 LayerNorm_type="WithBias", inner_dim=16),
         randn(2, 48, 16, 16))
    torch.manual_seed(302)
    dump("easy_channel_block",
         ez.ChannelTransformerBlock(dim=48, num_channel_heads=1,
                                    ffn_expansion_factor=2.66, bias=False,
                                    LayerNorm_type="WithBias"),
         randn(2, 48, 16, 16))
    torch.manual_seed(303)
    dump("easy_prompt_xrestormer_small",
         ez.EasyPromptXRestormer(dim=48, num_blocks=[1, 1, 1, 1],
                                 num_refinement_blocks=1),
         randn(1, 3, 64, 64), quantize=True)
    torch.manual_seed(304)
    dump("nafblock", nf.NAFBlock(32), randn(2, 32, 16, 16))
    torch.manual_seed(305)
    dump("nafnet_small",
         nf.NAFNet(img_channel=3, width=16, middle_blk_num=1,
                   enc_blk_nums=[1, 1, 1, 1], dec_blk_nums=[1, 1, 1, 1]),
         randn(1, 3, 60, 60))  # non-multiple of 16 exercises pad/crop


if __name__ == "__main__":
    main()
