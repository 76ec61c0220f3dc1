"""Golden fixtures for the CAMixer family.

Eval-path determinism requires ratio=1 (all windows hard; the reference's
eval routing is otherwise stochastic — it samples Gumbel noise even in
eval and sizes the keep-set from the sampled mask mean). With ratio=1
(and hard_ratio=1 for CATA) the reference eval path is deterministic and
identical to this framework's dense formulation, giving exact oracles for
every weight and every piece of attention/warp/gate math. Routing logic
itself is covered by unit tests.

Usage: python tools/gen_goldens_camixer.py
"""

import sys

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/reference")

import ref_stubs

ref_stubs.install()

import numpy as np
import torch

from net import camixer_prompt_xrestormer_eff as v1
from net import camixer_prompt_xrestormer_effv2 as v2
from net import ca_ta_promptxrestormer as cata

OUT = "tests/goldens"


def dump(name, module, x, quantize=False, extra=None, cond=None):
    module = module.eval().float()
    if quantize:
        sd = {k: v.half().float() for k, v in module.state_dict().items()}
        module.load_state_dict(sd)
    with torch.no_grad():
        args = [torch.from_numpy(x)]
        if cond is not None:
            args.append(torch.from_numpy(cond))
        y = module(*args, **(extra or {}))
    if isinstance(y, tuple):
        y = y[0]
    payload = {"x": x, "y": y.numpy()}
    if cond is not None:
        payload["cond"] = cond
    for k, v in module.state_dict().items():
        payload[f"sd::{k}"] = v.half().numpy() if quantize else v.numpy()
    np.savez_compressed(f"{OUT}/{name}.npz", **payload)
    print(f"{name}: x{x.shape} -> y{tuple(y.shape)}  "
          f"({sum(v.numel() for v in module.state_dict().values())} params)")


def main():
    g = torch.Generator().manual_seed(400)

    def randn(*shape):
        return torch.randn(*shape, generator=g).numpy().astype(np.float32)

    torch.manual_seed(401)
    dump("camixer_v1",
         v1.CAMixer(dim=48, window_size=8, ratio=1, training=False),
         randn(2, 48, 16, 16), cond=randn(2, 2, 16, 16))
    torch.manual_seed(402)
    dump("camixer_v2",
         v2.CAMixer(dim=48, window_size=8, num_heads=2, dim_head=16,
                    overlap_ratio=0.5, ratio=1),
         randn(2, 48, 16, 16), cond=randn(2, 2, 16, 16))
    torch.manual_seed(403)
    blk = v1.CATransformerBlock(dim=48, window_size=8, ratio=1,
                                training=False, num_channel_heads=2,
                                ffn_expansion_factor=2.66, bias=False,
                                LayerNorm_type="WithBias")
    blk.training = False
    blk.spatial_attn.training = False
    dump("ca_block_v1", blk, randn(1, 48, 16, 16), cond=randn(1, 2, 16, 16))
    torch.manual_seed(404)
    dump("ca_block_v2",
         v2.CATransformerBlock(dim=48, window_size=8, ratio=1,
                               num_channel_heads=2,
                               ffn_expansion_factor=2.66, bias=False,
                               LayerNorm_type="WithBias", num_heads=2,
                               dim_head=16, overlap_ratio=0.5),
         randn(1, 48, 16, 16), extra={"training": False},
         cond=randn(1, 2, 16, 16))
    torch.manual_seed(405)
    dump("cata_block",
         cata.CATransformerBlock(dim=48, window_size=8, ratio=1,
                                 num_channel_heads=2,
                                 ffn_expansion_factor=2.66, bias=False,
                                 LayerNorm_type="WithBias", num_heads=2,
                                 dim_head=16, overlap_ratio=0.5,
                                 hard_ratio=1),
         randn(2, 48, 16, 16), extra={"training": False},
         cond=randn(2, 2, 16, 16))
    torch.manual_seed(406)
    dump("ca_v2_small",
         v2.CAPromptXRestormerEffv2(dim=48, num_blocks=[1, 1, 1, 1],
                                    num_refinement_blocks=1,
                                    channel_heads=[1, 2, 4, 8],
                                    spatial_heads=[1, 2, 4, 8],
                                    ratio=1),
         randn(1, 3, 64, 64), quantize=True,
         extra={"training": False})
    # fresh input generator (the committed fixture was produced this way,
    # not from the shared stream above)
    g407 = torch.Generator().manual_seed(407)
    x407 = torch.randn(1, 3, 64, 64, generator=g407).numpy().astype(np.float32)
    torch.manual_seed(407)
    dump("ca_v1_small",
         v1.CAPromptXRestormerEff(dim=48, num_blocks=[1, 1, 1, 1],
                                  num_refinement_blocks=1,
                                  channel_heads=[1, 2, 4, 8],
                                  ratio=1, training=False),
         x407, quantize=True)


# NOTE: no goldens for camixer_prompt_uformer — the reference is unrunnable
# as committed at BOTH granularities (verified by running it): the full
# model applies a Conv2d global_predictor to (B, L, C) token tensors and
# feature-sized down/upsample modules to the 2-channel condition map
# (camixer_prompt_uformer.py:1595-1641), and even the standalone
# CATransformerBlock crashes in its PredictorLG — the in-block predictor is
# built for dim+4 input channels but is fed cat(v, condition) = dim+2
# (RuntimeError: expected 36 channels, got 34). The framework implements
# the intended working design; coverage is structural plus the shared
# CAMixerV1/LeFF/PromptBlock goldens.

if __name__ == "__main__":
    main()
