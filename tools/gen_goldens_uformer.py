"""Golden fixtures for the Uformer family.

The full PromptUformerIR with prompts hardcodes lin_dim=512 (embed 32),
which makes a full-model fixture ~80MB — too heavy. Coverage is composed
instead: every block type gets a golden (window attention via LeWin blocks
with/without shift/modulator/conv-projection/mlp, the Uformer PromptBlock,
up/down projections), plus a full-model fixture with prompt=False at
embed_dim=8 which exercises the entire 9-stage wiring, skips, shifts and
modulators. The prompt injection order is additionally locked by
`uformer_tiny_prompt`: embed 32 (hardcoded prompt dims) but depth-1 stages
at 64x64... too big; instead the injection order is asserted structurally
in tests.

Usage: python tools/gen_goldens_uformer.py
"""

import sys

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/reference")

import ref_stubs

ref_stubs.install()

import numpy as np
import torch

from net import prompt_uformer as pu

OUT = "tests/goldens"


def dump(name, module, x, quantize=False, tokens=False):
    module = module.eval().float()
    # The reference passes `bias` into SepConv2d's `dilation` positional
    # slot (prompt_uformer.py:390-392) — a no-op in torch 1.8 (bool==1)
    # but a TypeError in modern torch. Normalize to the intended value.
    for m in module.modules():
        if isinstance(m, torch.nn.Conv2d) and any(
            isinstance(d, bool) for d in m.dilation
        ):
            m.dilation = tuple(int(d) for d in m.dilation)
    if quantize:
        sd = {k: v.half().float() for k, v in module.state_dict().items()}
        module.load_state_dict(sd)
    with torch.no_grad():
        y = module(torch.from_numpy(x))
    payload = {"x": x, "y": y.numpy(), "tokens": np.array(1 if tokens else 0)}
    for k, v in module.state_dict().items():
        payload[f"sd::{k}"] = v.half().numpy() if quantize else v.numpy()
    np.savez_compressed(f"{OUT}/{name}.npz", **payload)
    print(f"{name}: x{x.shape} -> y{tuple(y.shape)}  "
          f"({sum(v.numel() for v in module.state_dict().values())} params)")


def main():
    g = torch.Generator().manual_seed(200)

    def randn(*shape):
        return torch.randn(*shape, generator=g).numpy().astype(np.float32)

    # LeWin blocks take (B, L, C) tokens with L = H*W (square grids)
    torch.manual_seed(201)
    dump(
        "lewin_block",
        pu.LeWinTransformerBlock(dim=32, num_heads=4, win_size=8,
                                 shift_size=0, token_mlp="leff",
                                 modulator=True),
        randn(2, 16 * 16, 32),
        tokens=True,
    )
    torch.manual_seed(202)
    dump(
        "lewin_block_shift",
        pu.LeWinTransformerBlock(dim=32, num_heads=4, win_size=8,
                                 shift_size=4, token_mlp="leff"),
        randn(2, 16 * 16, 32),
        tokens=True,
    )
    torch.manual_seed(203)
    dump(
        "lewin_block_mlp",
        pu.LeWinTransformerBlock(dim=32, num_heads=2, win_size=8,
                                 shift_size=0, token_mlp="mlp"),
        randn(1, 16 * 16, 32),
        tokens=True,
    )
    torch.manual_seed(204)
    dump(
        "lewin_block_convproj",
        pu.LeWinTransformerBlock(dim=32, num_heads=2, win_size=8,
                                 shift_size=0, token_mlp="leff",
                                 token_projection="conv"),
        randn(1, 16 * 16, 32),
        tokens=True,
    )
    torch.manual_seed(205)
    dump(
        "uformer_prompt_block",
        pu.PromptBlock(prompt_dim=32, prompt_len=5, prompt_size=8,
                       lin_dim=32, num_heads=4, win_size=8,
                       token_mlp="leff"),
        randn(1, 16 * 16, 32),
        tokens=True,
    )
    torch.manual_seed(206)
    dump(
        "uformer_downsample",
        pu.Downsample(16, 32),
        randn(1, 16 * 16, 16),
        tokens=True,
    )
    torch.manual_seed(207)
    dump(
        "uformer_upsample",
        pu.Upsample(32, 16),
        randn(1, 16 * 16, 32),
        tokens=True,
    )
    torch.manual_seed(208)
    dump(
        "uformer_small",
        pu.PromptUformerIR(
            embed_dim=8, depths=[1] * 9,
            num_heads=[1, 2, 4, 8, 16, 16, 8, 4, 2],
            win_size=8, token_projection="linear", token_mlp="leff",
            modulator=True, prompt=False,
        ),
        randn(1, 3, 128, 128),
        quantize=True,
    )


if __name__ == "__main__":
    main()
