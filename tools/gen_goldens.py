"""Generate golden parity fixtures from the reference PyTorch modules.

Run once at development time (requires /root/reference mounted). Runs the
*reference code itself* (never copied) on fixed-seed random inputs and
stores {torch state dict, input, output} per case as compressed .npz under
tests/goldens/. The pytest suite then checks this framework's NHWC/JAX ops
against these fixtures via the checkpoint converter — no torch or
/root/reference access needed at test time.

Usage: python tools/gen_goldens.py
"""

import sys

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

from net import model as ref  # the reference implementation, used as oracle

OUT = "tests/goldens"


def dump(name, module, x, quantize=False):
    """quantize=True rounds weights to fp16 before the forward and stores
    them as fp16 — half-size fixture, still an exact comparison (both the
    oracle and the tested impl consume identical values)."""
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
    import os

    os.makedirs(OUT, exist_ok=True)
    g = torch.Generator().manual_seed(0)

    def randn(*shape):
        return torch.randn(*shape, generator=g).numpy().astype(np.float32)

    def seed_all(s):
        torch.manual_seed(s)

    seed_all(1)
    dump("layernorm_withbias", ref.LayerNorm(48, "WithBias"), randn(2, 48, 11, 13))
    seed_all(2)
    dump("layernorm_biasfree", ref.LayerNorm(48, "BiasFree"), randn(2, 48, 11, 13))
    seed_all(3)
    dump("mdta_h1", ref.Attention(48, 1, False), randn(2, 48, 16, 16))
    seed_all(4)
    dump("mdta_h4", ref.Attention(64, 4, True), randn(2, 64, 12, 20))
    seed_all(5)
    dump("gdfn", ref.FeedForward(48, 2.66, False), randn(2, 48, 16, 16))
    seed_all(6)
    dump("downsample", ref.Downsample(48), randn(2, 48, 16, 16))
    seed_all(7)
    dump("upsample", ref.Upsample(48), randn(2, 48, 8, 8))
    seed_all(8)
    dump(
        "transformer_block",
        ref.TransformerBlock(48, 2, 2.66, False, "WithBias"),
        randn(2, 48, 16, 16),
    )
    seed_all(9)
    # resize path exercised both up (16->24) and down (16->12)
    dump(
        "promptgen_up",
        ref.PromptGenBlock(prompt_dim=32, prompt_len=5, prompt_size=16, lin_dim=48),
        randn(2, 48, 24, 24),
    )
    seed_all(10)
    dump(
        "promptgen_down",
        ref.PromptGenBlock(prompt_dim=32, prompt_len=5, prompt_size=16, lin_dim=48),
        randn(2, 48, 12, 12),
    )
    seed_all(11)
    dump("patch_embed", ref.OverlapPatchEmbed(3, 48, False), randn(2, 3, 16, 16))

    # Reduced-depth full model: same dims/wiring as released config but one
    # block per level so the fixture stays small.
    seed_all(12)
    net = ref.PromptIR(
        dim=48,
        num_blocks=[1, 1, 1, 1],
        num_refinement_blocks=1,
        heads=[1, 2, 4, 8],
        decoder=True,
    )
    dump("promptir_small", net, randn(1, 3, 64, 64), quantize=True)

    # FULL-depth flagship (num_blocks [4,6,6,8], refinement 4 — the released
    # checkpoint's config, net/model.py:244-263): 548 tensors / 35,592,263
    # params. The fixture is the strongest released-ckpt parity evidence
    # available without the ckpt itself: key coverage (all 548 tensors must
    # land in the flax tree) + one 64px forward.
    seed_all(15)
    full = ref.PromptIR(decoder=True)
    dump("promptir_full", full, randn(1, 3, 64, 64), quantize=True)

    # SR_Upsample lives in the camixer variant files (dead code in the
    # reference — never instantiated — but part of the §2.1 inventory)
    import ref_stubs

    ref_stubs.install()
    from net import camixer_prompt_xrestormer_eff as ref_ca

    seed_all(13)
    dump("sr_upsample_x4", ref_ca.SR_Upsample(4, 16), randn(2, 16, 9, 11))
    seed_all(14)
    dump("sr_upsample_x3", ref_ca.SR_Upsample(3, 16), randn(2, 16, 9, 11))


if __name__ == "__main__":
    main()
