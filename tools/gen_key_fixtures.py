"""State-dict KEY fixtures for full-depth converter coverage tests.

The full-depth PromptIR golden (tests/goldens/promptir_full.npz) carries
values because it also pins a forward; the variant families only need
key-space + shape coverage of `convert_state_dict` at their reference
training depths, so we store just {key: shape, dtype-kind} as small JSON
files instead of ~100 MB of weights per family.

Configs mirror the reference training entry points exactly:
  * PromptXRestormer    /root/reference/train.py:94-108
  * PromptXRestormerEff /root/reference/train.py:177-191
  * PromptUformerIR     /root/reference/train.py:62-63
  * CAPromptXRestormerEffv2 /root/reference/train_capromptxrestormer.py:30-48

Usage: python tools/gen_key_fixtures.py
"""

import json
import sys

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/reference")

import ref_stubs

ref_stubs.install()

OUT = "tests/goldens"


def dump(name, module):
    sd = module.state_dict()
    keys = {
        k: {"shape": list(v.shape), "kind": v.numpy().dtype.kind}
        for k, v in sd.items()
    }
    path = f"{OUT}/sd_keys_{name}.json"
    with open(path, "w") as f:
        json.dump(keys, f, indent=0, sort_keys=True)
    n = sum(v.numel() for v in sd.values())
    print(f"{name}: {len(keys)} tensors, {n} params -> {path}")


def main():
    from net.camixer_prompt_xrestormer_effv2 import CAPromptXRestormerEffv2
    from net.prompt_uformer import PromptUformerIR
    from net.prompt_xrestormer import PromptXRestormer
    from net.prompt_xrestormer_eff import PromptXRestormerEff

    dump(
        "promptxrestormerir",
        PromptXRestormer(
            inp_channels=3, out_channels=3, dim=48,
            num_blocks=[2, 4, 4, 4], num_refinement_blocks=4,
            channel_heads=[1, 1, 1, 1], spatial_heads=[1, 2, 4, 8],
            overlap_ratio=[0.5, 0.5, 0.5, 0.5],
            ffn_expansion_factor=2.66, bias=False,
            LayerNorm_type="WithBias", scale=1, prompt=True,
        ),
    )
    dump(
        "promptxrestormereffir",
        PromptXRestormerEff(
            inp_channels=3, out_channels=3, dim=48,
            num_blocks=[2, 4, 4, 4], num_refinement_blocks=4,
            channel_heads=[1, 1, 1, 1], spatial_heads=[1, 2, 4, 8],
            overlap_ratio=[0.5, 0.5, 0.5, 0.5],
            ffn_expansion_factor=2.66, bias=False,
            LayerNorm_type="WithBias", scale=1, prompt=True,
        ),
    )
    dump(
        "promptuformerir",
        PromptUformerIR(
            embed_dim=32, win_size=8, token_projection="linear",
            token_mlp="leff", depths=[1, 2, 8, 8, 2, 8, 8, 2, 1],
            modulator=True,
        ),
    )
    dump(
        "capromptxrestormereffv2",
        CAPromptXRestormerEffv2(
            inp_channels=3, out_channels=3, dim=48,
            num_blocks=[2, 4, 4, 4], num_refinement_blocks=4,
            channel_heads=[1, 1, 1, 1], spatial_heads=[1, 2, 4, 8],
            overlap_ratio=0.5, dim_head=16, ratio=0.5, window_size=8,
            bias=False, ffn_expansion_factor=2.66,
            LayerNorm_type="WithBias", scale=1, prompt=True,
        ),
    )


if __name__ == "__main__":
    main()
