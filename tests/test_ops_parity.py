"""Numerical parity of core ops vs reference-generated goldens.

Each golden fixture was produced by running the reference PyTorch module
(see tools/gen_goldens.py); here the torch state dict is converted with the
compat layer and the NHWC/JAX op must reproduce the output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from promptir_tpu.compat.torch_ckpt import convert_state_dict
from promptir_tpu.models.blocks import TransformerBlock
from promptir_tpu.ops import (
    GDFN,
    MDTA,
    Downsample,
    OverlapPatchEmbed,
    PromptGenBlock,
    RestormerLayerNorm,
    Upsample,
)

TOL = dict(rtol=2e-5, atol=2e-5)


def run(module, g):
    variables = convert_state_dict(g.state_dict)
    y = module.apply(variables, jnp.asarray(g.x_nhwc))
    np.testing.assert_allclose(np.asarray(y), g.y_nhwc, **TOL)


def test_layernorm_withbias(golden):
    g = golden("layernorm_withbias")
    run(RestormerLayerNorm(48, bias_free=False), g)


def test_layernorm_biasfree(golden):
    g = golden("layernorm_biasfree")
    run(RestormerLayerNorm(48, bias_free=True), g)


def test_mdta_single_head(golden):
    run(MDTA(48, 1, use_bias=False), golden("mdta_h1"))


def test_mdta_multi_head_bias(golden):
    run(MDTA(64, 4, use_bias=True), golden("mdta_h4"))


def test_gdfn(golden):
    run(GDFN(48, 2.66, use_bias=False), golden("gdfn"))


def test_downsample(golden):
    run(Downsample(48), golden("downsample"))


def test_downsample_fold_matches_direct():
    """The shuffle-folded stride-2 form (applied at C=48/96) must equal the
    direct conv3x3 + pixel_unshuffle on the same parameter, and C=384 must
    keep the direct path — both sides of the lane-cost heuristic."""
    import jax

    from promptir_tpu.ops.resample import pixel_unshuffle

    for n_feat in (48, 96, 384):
        m = Downsample(n_feat)
        x = jnp.asarray(
            np.random.default_rng(n_feat)
            .normal(size=(2, 8, 16, n_feat)).astype(np.float32)
        )
        p = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(p, x)
        w = p["params"]["body_0"]["kernel"]
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        ref = pixel_unshuffle(ref, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_upsample(golden):
    run(Upsample(48), golden("upsample"))


@pytest.mark.parametrize("case,scale", [("sr_upsample_x4", 4), ("sr_upsample_x3", 3)])
def test_sr_upsample(golden, case, scale):
    from promptir_tpu.ops.resample import SRUpsample

    run(SRUpsample(scale, 16), golden(case))


def test_sr_upsample_rejects_bad_scale():
    from promptir_tpu.ops.resample import SRUpsample

    x = jnp.zeros((1, 4, 4, 8))
    with pytest.raises(ValueError, match="not supported"):
        SRUpsample(5, 8).init(jax.random.PRNGKey(0), x)


def test_transformer_block(golden):
    run(TransformerBlock(48, 2, 2.66, use_bias=False), golden("transformer_block"))


@pytest.mark.parametrize("case", ["promptgen_up", "promptgen_down"])
def test_promptgen(golden, case):
    g = golden(case)
    run(
        PromptGenBlock(prompt_dim=32, prompt_len=5, prompt_size=16, lin_dim=48),
        g,
    )


def test_patch_embed(golden):
    run(OverlapPatchEmbed(48, use_bias=False), golden("patch_embed"))


def test_pixel_shuffle_roundtrip():
    from promptir_tpu.ops import pixel_shuffle, pixel_unshuffle

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 12)))
    y = pixel_shuffle(pixel_unshuffle(x, 2), 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
