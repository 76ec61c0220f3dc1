"""Parity tests for Easy/NAF blocks, EasyPromptXRestormer, and NAFNet."""

import jax
import jax.numpy as jnp
import numpy as np

from promptir_tpu.compat.torch_ckpt import check_params_match, convert_state_dict
from promptir_tpu.models import create_model
from promptir_tpu.ops.easy import (
    EasyChannelTransformerBlock,
    EasyTransformerBlock,
    NAFBlock,
    round_to_nearest_power_of_2,
)


def run(module, g, rtol=3e-5, atol=3e-5):
    variables = convert_state_dict(g.state_dict)
    y = module.apply(variables, jnp.asarray(g.x_nhwc))
    np.testing.assert_allclose(np.asarray(y), g.y_nhwc, rtol=rtol, atol=atol)


def test_round_to_pow2():
    assert round_to_nearest_power_of_2(int(2.66 * 48)) == 128
    assert round_to_nearest_power_of_2(64) == 64
    assert round_to_nearest_power_of_2(96) == 128
    assert round_to_nearest_power_of_2(95) == 64


def test_easy_block(golden):
    run(EasyTransformerBlock(dim=48, inner_dim=16), golden("easy_block"))


def test_easy_channel_block(golden):
    run(EasyChannelTransformerBlock(dim=48), golden("easy_channel_block"))


def test_nafblock(golden):
    run(NAFBlock(32), golden("nafblock"))


def test_easy_prompt_xrestormer_small(golden):
    g = golden("easy_prompt_xrestormer_small")
    model = create_model(
        "easypromptxrestormer", num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1,
    )
    variables = convert_state_dict(g.state_dict)
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    check_params_match(variables, init)
    run(model, g, rtol=1e-4, atol=1e-4)


def test_nafnet_small(golden):
    g = golden("nafnet_small")
    model = create_model(
        "nafnet", width=16, middle_blk_num=1, enc_blk_nums=(1, 1, 1, 1),
        dec_blk_nums=(1, 1, 1, 1),
    )
    variables = convert_state_dict(g.state_dict)
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 60, 60, 3)))
    )
    check_params_match(variables, init)
    run(model, g, rtol=1e-4, atol=1e-4)
