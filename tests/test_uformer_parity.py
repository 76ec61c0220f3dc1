"""Parity tests for the Uformer family vs reference goldens.

Reference blocks operate on (B, L, C) square token grids; our NHWC modules
see the same data as (B, s, s, C) with s = sqrt(L).
"""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from promptir_tpu.compat.torch_ckpt import check_params_match, convert_state_dict
from promptir_tpu.models import create_model
from promptir_tpu.models.prompt_uformer import UformerPromptBlock
from promptir_tpu.ops.window_attention import (
    LeWinTransformerBlock,
    UformerDownsample,
    UformerUpsample,
)

TOL = dict(rtol=3e-5, atol=3e-5)


def tok_grid(x):
    b, l, c = x.shape
    s = int(np.sqrt(l))
    return x.reshape(b, s, s, c)


def run_tokens(module, g, **tol):
    tol = tol or TOL
    variables = convert_state_dict(g.state_dict)
    x = jnp.asarray(tok_grid(g.x))
    y = module.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(y).reshape(g.y.shape), g.y, **tol
    )


def test_lewin_block_modulator(golden):
    run_tokens(
        LeWinTransformerBlock(dim=32, num_heads=4, win_size=8, shift_size=0,
                              token_mlp="leff", modulator=True),
        golden("lewin_block"),
    )


def test_lewin_block_shift(golden):
    run_tokens(
        LeWinTransformerBlock(dim=32, num_heads=4, win_size=8, shift_size=4,
                              token_mlp="leff"),
        golden("lewin_block_shift"),
    )


def test_lewin_block_mlp(golden):
    run_tokens(
        LeWinTransformerBlock(dim=32, num_heads=2, win_size=8, shift_size=0,
                              token_mlp="mlp"),
        golden("lewin_block_mlp"),
    )


def test_lewin_block_convproj(golden):
    run_tokens(
        LeWinTransformerBlock(dim=32, num_heads=2, win_size=8, shift_size=0,
                              token_mlp="leff", token_projection="conv"),
        golden("lewin_block_convproj"),
    )


def test_uformer_prompt_block(golden):
    run_tokens(
        UformerPromptBlock(prompt_dim=32, prompt_len=5, prompt_size=8,
                           lin_dim=32, num_heads=4, win_size=8,
                           token_mlp="leff"),
        golden("uformer_prompt_block"),
    )


def test_uformer_downsample(golden):
    run_tokens(UformerDownsample(32), golden("uformer_downsample"))


def test_uformer_upsample(golden):
    run_tokens(UformerUpsample(16), golden("uformer_upsample"))


@pytest.mark.slow
def test_uformer_small_full_model(golden):
    g = golden("uformer_small")
    model = create_model(
        "promptuformerir", embed_dim=8, depths=(1,) * 9, prompt=False,
        modulator=True,
    )
    variables = convert_state_dict(g.state_dict)
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    )
    check_params_match(variables, init)
    y = model.apply(variables, jnp.asarray(g.x_nhwc))
    np.testing.assert_allclose(np.asarray(y), g.y_nhwc, rtol=1e-4, atol=1e-4)


def test_prompt_uformer_full_config_builds():
    """Full released config (embed 32, prompts on) initializes and the
    prompt blocks sit at the documented injection points."""
    model = create_model("promptuformerir")
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    )
    p = init["params"]
    assert p["promptlayer_0"]["prompt_param"].shape == (5, 8, 8, 512)
    assert p["promptlayer_1"]["prompt_param"].shape == (5, 16, 16, 512)
    assert p["promptlayer_2"]["prompt_param"].shape == (5, 32, 32, 256)
    assert p["promptlayer_3"]["prompt_param"].shape == (5, 64, 64, 128)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p))
    assert n > 30e6  # PromptUformer_B scale
