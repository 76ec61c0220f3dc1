"""End-to-end PromptIR parity vs the reference implementation.

`promptir_small` is the full released architecture (dim 48, prompts, the
asymmetric decoder wiring, dead layers) at depth 1 per level, run by the
reference code on a fixed random input. The converted state dict must
reproduce the output through our NHWC model, proving the wiring and every
op match; the full-depth model differs only in block counts.
"""

import jax
import numpy as np
import jax.numpy as jnp

from promptir_tpu.compat.torch_ckpt import check_params_match, convert_state_dict
from promptir_tpu.models import create_model


def test_promptir_small_forward(golden):
    g = golden("promptir_small")
    model = create_model(
        "promptir", num_blocks=(1, 1, 1, 1), num_refinement_blocks=1
    )
    variables = convert_state_dict(g.state_dict)

    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros_like(jnp.asarray(g.x_nhwc)))
    )
    check_params_match(variables, init)

    y = model.apply(variables, jnp.asarray(g.x_nhwc))
    np.testing.assert_allclose(np.asarray(y), g.y_nhwc, rtol=5e-5, atol=5e-5)


def test_promptir_full_depth_ckpt_coverage_and_forward(golden):
    """Released-checkpoint fidelity at FULL depth (num_blocks [4,6,6,8],
    refinement 4 — net/model.py:244-263): all 548 tensors of the
    reference state dict must land in the flax tree with correct shapes
    through `convert_state_dict`, and the converted weights must
    reproduce the reference 64px forward. This is the strongest
    released-ckpt parity evidence available without the ckpt itself
    (ckpt/README.md:1): same config, same key space, same math.
    """
    g = golden("promptir_full")
    assert len(g.state_dict) == 548
    model = create_model("promptir")
    variables = convert_state_dict(g.state_dict)

    init = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros_like(jnp.asarray(g.x_nhwc))
        )
    )
    check_params_match(variables, init)  # 548/548 keys, exact shapes

    y = model.apply(variables, jnp.asarray(g.x_nhwc))
    np.testing.assert_allclose(np.asarray(y), g.y_nhwc, rtol=2e-4, atol=2e-4)


def test_promptir_param_count():
    model = create_model("promptir")
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(init))
    assert n == 35_592_263  # exact match with the reference model


def test_all_prompt_models_build_at_non_default_dim():
    """Width-regression guard: the reference hardcodes dim=48-only
    literals for the prompt-interaction widths (e.g. noise_level3 as
    int(dim*4)+512 == actual 8d+320 only at d=48,
    camixer_prompt_xrestormer_eff.py:735); our models derive the width
    from the actual concat, so every family must SHAPE-CHECK at a
    non-default dim. jax.eval_shape traces without running — catches any
    hardcoded-width mismatch in seconds."""
    cases = {
        "promptir": {},
        "promptxrestormereffir": {},
        "easypromptxrestormer": {},
        "promptxrestormerir": {},
        "capromptxrestormereff": {"ratio": 0.5},
        "capromptxrestormereffv2": {"ratio": 0.5},
        "catapromptxrestormer": {"ratio": 0.5},
    }
    x = jnp.zeros((1, 64, 64, 3))
    for name, extra in cases.items():
        model = create_model(
            name, dim=16, num_blocks=(1, 1, 1, 1),
            num_refinement_blocks=1, **extra,
        )
        try:
            shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        except TypeError as e:  # models whose __call__ needs flags
            shapes = jax.eval_shape(
                lambda r, t: model.init(r, t, True), jax.random.PRNGKey(0), x
            )
        assert shapes["params"], name
