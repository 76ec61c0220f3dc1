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


def test_promptir_param_count():
    model = create_model("promptir")
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(init))
    assert n == 35_592_263  # exact match with the reference model
