"""Parity tests for the X-Restormer family vs reference goldens."""

import jax
import jax.numpy as jnp
import numpy as np

from promptir_tpu.compat.torch_ckpt import check_params_match, convert_state_dict
from promptir_tpu.models import create_model
from promptir_tpu.models.prompt_xrestormer import PromptXBlock
from promptir_tpu.models.xrestormer import XTransformerBlock
from promptir_tpu.ops.ocab import OCAB, extract_overlapping_windows
import pytest


def run(module, g, rtol=3e-5, atol=3e-5):
    variables = convert_state_dict(g.state_dict)
    y = module.apply(variables, jnp.asarray(g.x_nhwc))
    np.testing.assert_allclose(np.asarray(y), g.y_nhwc, rtol=rtol, atol=atol)


def test_extract_overlapping_windows_matches_unfold_layout():
    # window 0 of a 8->12 halo must contain zero padding on its first 2
    # rows/cols and x[0:10, 0:10] content
    x = jnp.asarray(
        np.arange(1 * 16 * 16 * 1, dtype=np.float32).reshape(1, 16, 16, 1)
    )
    w = extract_overlapping_windows(x, 8, 12)
    assert w.shape == (1, 4, 144, 1)
    w0 = np.asarray(w[0, 0, :, 0]).reshape(12, 12)
    assert (w0[:2, :] == 0).all() and (w0[:, :2] == 0).all()
    np.testing.assert_array_equal(w0[2:, 2:], np.asarray(x[0, :10, :10, 0]))


def test_ocab(golden):
    g = golden("ocab")
    run(
        OCAB(dim=48, window_size=8, overlap_ratio=0.5, num_heads=2,
             dim_head=16),
        g,
    )


def test_xblock(golden):
    run(
        XTransformerBlock(
            dim=48, window_size=8, overlap_ratio=0.5, num_channel_heads=2,
            num_spatial_heads=2, spatial_dim_head=16,
        ),
        golden("xblock"),
    )


def test_prompt_xblock(golden):
    run(
        PromptXBlock(
            prompt_dim=32, prompt_len=5, prompt_size=16, lin_dim=48,
            num_channel_heads=1, num_spatial_heads=2,
        ),
        golden("prompt_xblock"),
    )


@pytest.mark.slow
def test_xrestormer_small(golden):
    g = golden("xrestormer_small")
    model = create_model(
        "xrestormerir", num_blocks=(1, 1, 1, 1), num_refinement_blocks=1
    )
    variables = convert_state_dict(g.state_dict)
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    check_params_match(variables, init)
    run(model, g, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_prompt_xrestormer_small(golden):
    g = golden("prompt_xrestormer_small")
    model = create_model(
        "promptxrestormerir", num_blocks=(1, 1, 1, 1), num_refinement_blocks=1
    )
    variables = convert_state_dict(g.state_dict)
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    check_params_match(variables, init)
    run(model, g, rtol=1e-4, atol=1e-4)


def test_prompt_xrestormer_eff_small(golden):
    from promptir_tpu.models.prompt_xrestormer_eff import PromptXRestormerEff  # noqa: F401

    g = golden("prompt_xrestormer_eff_small")
    model = create_model(
        "promptxrestormereffir", num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1,
    )
    variables = convert_state_dict(g.state_dict)
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    check_params_match(variables, init)
    run(model, g, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_xblock_fused_matches_unfused():
    """fused_ffn XTransformerBlock: same params, same output (interpret)."""
    import functools

    import promptir_tpu.ops.pallas.autodiff as ad
    from promptir_tpu.models.xrestormer import XTransformerBlock

    x = jnp.asarray(
        np.random.default_rng(21).normal(size=(1, 16, 16, 48))
        .astype(np.float32)
    )
    ref_blk = XTransformerBlock(dim=48, num_channel_heads=2)
    params = ref_blk.init(jax.random.PRNGKey(0), x)
    ref = ref_blk.apply(params, x)

    fused_blk = XTransformerBlock(dim=48, num_channel_heads=2, fused_ffn=True)
    p2 = jax.eval_shape(lambda: fused_blk.init(jax.random.PRNGKey(0), x))
    assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(
        jax.eval_shape(lambda: params)
    )

    orig = ad.ln_block, ad.ln_mdta, ad.ln_gdfn
    ad.ln_block = functools.partial(orig[0], interpret=True)
    ad.ln_mdta = functools.partial(orig[1], interpret=True)
    ad.ln_gdfn = functools.partial(orig[2], interpret=True)
    try:
        out = fused_blk.apply(params, x)
    finally:
        ad.ln_block, ad.ln_mdta, ad.ln_gdfn = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4,
                               atol=5e-4)


def test_channel_block_fused_matches_unfused():
    import functools

    import promptir_tpu.ops.pallas.autodiff as ad
    from promptir_tpu.models.prompt_xrestormer_eff import (
        ChannelTransformerBlock,
    )

    x = jnp.asarray(
        np.random.default_rng(22).normal(size=(1, 16, 16, 48))
        .astype(np.float32)
    )
    ref_blk = ChannelTransformerBlock(dim=48)
    params = ref_blk.init(jax.random.PRNGKey(0), x)
    ref = ref_blk.apply(params, x)
    fused_blk = ChannelTransformerBlock(dim=48, fused_ffn=True)
    orig = ad.ln_block, ad.ln_mdta, ad.ln_gdfn
    ad.ln_block = functools.partial(orig[0], interpret=True)
    ad.ln_mdta = functools.partial(orig[1], interpret=True)
    ad.ln_gdfn = functools.partial(orig[2], interpret=True)
    try:
        out = fused_blk.apply(params, x)
    finally:
        ad.ln_block, ad.ln_mdta, ad.ln_gdfn = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4,
                               atol=5e-4)
