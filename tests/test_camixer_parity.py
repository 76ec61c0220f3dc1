"""Parity + routing tests for the CAMixer dynamic-compute family.

Goldens use ratio=1 (all windows routed hard), where the reference eval
path is deterministic and equals the dense formulation exactly. Routing
behavior at ratio<1 is covered by unit tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from promptir_tpu.compat.torch_ckpt import check_params_match, convert_state_dict
from promptir_tpu.models import create_model
from promptir_tpu.models.camixer_models import (
    CATABlock,
    CATransformerBlockV1,
    CATransformerBlockV2,
)
from promptir_tpu.ops.camixer import CAMixerV1, CAMixerV2, topk_window_mask
from promptir_tpu.ops.flow_warp import flow_warp
import pytest

TOL = dict(rtol=5e-5, atol=5e-5)


def run(module, g, **tol):
    tol = tol or TOL
    variables = convert_state_dict(g.state_dict)
    out = module.apply(
        variables, jnp.asarray(g.x_nhwc), jnp.asarray(g.cond_nhwc), True
    )
    if isinstance(out, tuple):
        out = out[0]
    np.testing.assert_allclose(np.asarray(out), g.y_nhwc, **tol)


def test_flow_warp_matches_torch_grid_sample():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 9, 11, 4)).astype(np.float32)
    flow = (rng.normal(size=(2, 9, 11, 2)) * 3).astype(np.float32)

    ours = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ft = torch.from_numpy(flow)
    n, c, h, w = xt.shape
    gy, gx = torch.meshgrid(
        torch.arange(h, dtype=torch.float32),
        torch.arange(w, dtype=torch.float32), indexing="ij",
    )
    grid = torch.stack((gx, gy), 2)
    vgrid = grid.unsqueeze(0) + ft
    vx = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    ref = F.grid_sample(
        xt, torch.stack((vx, vy), 3), mode="bilinear",
        padding_mode="border", align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_topk_window_mask():
    scores = jnp.asarray([[0.9, 0.1, 0.5, 0.7], [0.2, 0.8, 0.3, 0.4]])
    m = np.asarray(topk_window_mask(scores, 2))
    np.testing.assert_array_equal(m, [[1, 0, 0, 1], [0, 1, 0, 1]])
    np.testing.assert_array_equal(np.asarray(topk_window_mask(scores, 4)), 1)


@pytest.mark.slow
def test_camixer_v1(golden):
    run(CAMixerV1(dim=48, window_size=8, ratio=1.0), golden("camixer_v1"))


def test_camixer_v2(golden):
    run(
        CAMixerV2(dim=48, window_size=8, overlap_ratio=0.5, num_heads=2,
                  dim_head=16, ratio=1.0),
        golden("camixer_v2"),
    )


def test_ca_block_v1(golden):
    run(
        CATransformerBlockV1(dim=48, window_size=8, ratio=1.0,
                             num_channel_heads=2),
        golden("ca_block_v1"),
    )


def test_ca_block_v2(golden):
    run(
        CATransformerBlockV2(dim=48, window_size=8, ratio=1.0,
                             num_channel_heads=2, num_heads=2, dim_head=16),
        golden("ca_block_v2"),
    )


def test_cata_block(golden):
    run(
        CATABlock(dim=48, window_size=8, ratio=1.0, hard_ratio=1.0,
                  num_channel_heads=2, num_heads=2, dim_head=16),
        golden("cata_block"),
    )


@pytest.mark.slow
def test_ca_v2_small_full_model(golden):
    g = golden("ca_v2_small")
    model = create_model(
        "capromptxrestormereffv2", num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1, ratio=1.0,
    )
    variables = convert_state_dict(g.state_dict)
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    check_params_match(variables, init)
    y = model.apply(variables, jnp.asarray(g.x_nhwc), True)
    np.testing.assert_allclose(np.asarray(y), g.y_nhwc, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_ca_v2_training_returns_ratio_loss():
    model = create_model(
        "capromptxrestormereffv2", dim=48, num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1, ratio=0.5,
    )
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        x, False,
    )
    out, ratio_loss = model.apply(
        variables, x, False, rngs={"gumbel": jax.random.PRNGKey(2)}
    )
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(float(ratio_loss))


@pytest.mark.slow
def test_cata_training_returns_both_losses():
    model = create_model(
        "catapromptxrestormer", dim=48, num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1, ratio=0.5, hard_ratio=0.5,
    )
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        x, False,
    )
    out, ratio_loss, hard_loss = model.apply(
        variables, x, False, rngs={"gumbel": jax.random.PRNGKey(2)}
    )
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(float(ratio_loss)) and np.isfinite(float(hard_loss))


@pytest.mark.slow
def test_ca_v1_eval_builds():
    model = create_model(
        "capromptxrestormereff", dim=48, num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1, ratio=0.5,
    )
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, True)
    y = model.apply(variables, x, True)
    assert y.shape == (1, 64, 64, 3)


@pytest.mark.slow
def test_ca_prompt_uformer_builds_and_runs():
    """The reference camixer_prompt_uformer forward is unrunnable as
    committed (token/conv shape bugs); this validates our working
    implementation of the intended design structurally."""
    model = create_model(
        "capromptuformerir", embed_dim=8, depths=(1,) * 9, prompt=False,
        ratio=0.5,
    )
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, True)
    y = model.apply(variables, x, True)
    assert y.shape == (1, 128, 128, 3)
    out, dec = model.apply(
        variables, x, False, rngs={"gumbel": jax.random.PRNGKey(1)}
    )
    assert out.shape == (1, 128, 128, 3) and np.isfinite(float(dec))

@pytest.mark.slow
def test_ca_v1_small_full_model(golden):
    """Full-model oracle for CAPromptXRestormerEff (v1): the reference's
    eval forward (camixer_prompt_xrestormer_eff.py:855-935) IS runnable at
    ratio=1 (unlike its training path), so the whole assembly — CAMixer v1
    deformable-key window attention, global predictor condition pyramid,
    prompt wiring — is pinned against the reference, not just the blocks."""
    g = golden("ca_v1_small")
    model = create_model(
        "capromptxrestormereff", num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1, ratio=1.0,
    )
    variables = convert_state_dict(g.state_dict)
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    check_params_match(variables, init)
    y = model.apply(variables, jnp.asarray(g.x_nhwc), True)
    np.testing.assert_allclose(np.asarray(y), g.y_nhwc, rtol=2e-4, atol=2e-4)
