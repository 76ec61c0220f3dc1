"""CAMixer-family training integration: gumbel routing + ratio losses
through the jitted DP step (reference train_capromptxrestormer.py
semantics: loss = L1 + ratio_loss)."""

import jax
import jax.numpy as jnp
import numpy as np

from promptir_tpu.models import create_model
from promptir_tpu.train.state import create_train_state, make_optimizer
from promptir_tpu.train.step import make_train_step


def make_batch(n=2, s=64):
    rng = np.random.default_rng(0)
    return {
        "degraded": rng.uniform(size=(n, s, s, 3)).astype(np.float32),
        "clean": rng.uniform(size=(n, s, s, 3)).astype(np.float32),
        "de_type": np.zeros(n, np.int32),
    }


def test_ca_v2_train_step():
    model = create_model(
        "capromptxrestormereffv2", dim=48, num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1, ratio=0.5,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        tx=make_optimizer(1e-4),
    )
    step = jax.jit(make_train_step(model, stochastic=True))
    batch = make_batch()
    state, m1 = step(state, batch)
    state, m2 = step(state, batch)
    assert np.isfinite(float(m1["train_loss"]))
    assert float(m2["grad_norm"]) > 0  # gradients flow through routing
