"""Parity tests for Easy/NAF blocks, EasyPromptXRestormer, and NAFNet."""
import pytest

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


@pytest.mark.slow
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


def test_local_avg_pool_semantics():
    """TLC local pool: integral-image window means, replicate-padded; global
    mean when the kernel covers the map."""
    import numpy as np

    from promptir_tpu.ops.easy import local_avg_pool

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 9, 11, 3)).astype(np.float32))
    k1, k2 = 4, 5
    out = np.asarray(local_avg_pool(x, (k1, k2)))
    assert out.shape == x.shape
    # valid-position means, placed with the TLC pad split
    xn = np.asarray(x)
    valid = np.zeros((2, 9 - k1 + 1, 11 - k2 + 1, 3), np.float32)
    for i in range(valid.shape[1]):
        for j in range(valid.shape[2]):
            valid[:, i, j] = xn[:, i : i + k1, j : j + k2].mean(axis=(1, 2))
    ph, pw = 9 - valid.shape[1], 11 - valid.shape[2]
    inner = out[:, ph // 2 : ph // 2 + valid.shape[1],
                pw // 2 : pw // 2 + valid.shape[2]]
    np.testing.assert_allclose(inner, valid, rtol=1e-5, atol=1e-5)
    # replicate padding at the borders
    np.testing.assert_allclose(out[:, 0], out[:, ph // 2], rtol=0, atol=0)
    # kernel >= map -> global mean
    g = np.asarray(local_avg_pool(x, (20, 20)))
    np.testing.assert_allclose(
        g[:, 0, 0], xn.mean(axis=(1, 2)), rtol=1e-6, atol=1e-6
    )


@pytest.mark.slow
def test_nafnetlocal_matches_nafnet_weights(golden):
    """NAFNetLocal shares NAFNet's parameter tree; with a TLC kernel covering
    every feature map it reproduces NAFNet exactly, and with the real local
    kernel it still runs (and differs) on large inputs."""
    import numpy as np

    g = golden("nafnet_small")
    kw = dict(width=16, middle_blk_num=1, enc_blk_nums=(1, 1, 1, 1),
              dec_blk_nums=(1, 1, 1, 1))
    variables = convert_state_dict(g.state_dict)
    # the golden weights are freshly initialized, so beta/gamma are zero and
    # every NAFBlock is an identity; give the residual scales weight so the
    # SCA pooling actually influences the output
    variables = jax.tree_util.tree_map_with_path(
        lambda path, v: jnp.full_like(v, 0.3)
        if path[-1].key in ("beta", "gamma")
        else v,
        variables,
    )
    base = create_model("nafnet", **kw)
    x = jnp.asarray(g.x_nhwc)
    y_base = base.apply(variables, x)

    # kernel >= any feature map -> identical to global-pool NAFNet
    wide = create_model("nafnetlocal", tlc_base=(4096, 4096), **kw)
    np.testing.assert_allclose(
        np.asarray(wide.apply(variables, x)), np.asarray(y_base),
        rtol=1e-6, atol=1e-6,
    )

    # real TLC config on an input larger than train_size: runs, differs
    local = create_model("nafnetlocal", tlc_train_size=(32, 32), **kw)
    y_local = local.apply(variables, x)
    assert y_local.shape == y_base.shape
    assert float(jnp.max(jnp.abs(y_local - y_base))) > 1e-6
