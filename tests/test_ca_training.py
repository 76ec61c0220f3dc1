"""CAMixer-family training integration: gumbel routing + ratio losses
through the jitted DP step (reference train_capromptxrestormer.py
semantics: loss = L1 + ratio_loss)."""

import jax
import jax.numpy as jnp
import numpy as np

from promptir_tpu.models import create_model
from promptir_tpu.train.state import create_train_state, make_optimizer
from promptir_tpu.train.step import make_train_step
import pytest


def make_batch(n=2, s=64):
    rng = np.random.default_rng(0)
    return {
        "degraded": rng.uniform(size=(n, s, s, 3)).astype(np.float32),
        "clean": rng.uniform(size=(n, s, s, 3)).astype(np.float32),
        "de_type": np.zeros(n, np.int32),
    }


@pytest.mark.slow
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


@pytest.mark.slow
def test_stochastic_grad_accum_rng_folding():
    """Scan-accumulated microbatches through the stochastic step fold one
    'gumbel' rng per (step, microbatch): key = fold_in(PRNGKey(seed),
    step*grad_accum + midx). Verified against the formula with a minimal
    gumbel-consuming module (the CA-v2 integration at grad_accum=1 is
    pinned by test_ca_v2_train_step; its full-depth accum compile is too
    heavy for CPU CI), plus run-to-run determinism of the stochastic
    update and the grad_accum=1 reduction to the plain per-step fold."""
    from flax import linen as nn

    class GumbelEcho(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            w = self.param("w", nn.initializers.zeros, (1,))
            g = jax.random.gumbel(self.make_rng("gumbel"), x.shape)
            return x * 0 + g + w, jnp.zeros(())  # aux exercises ratio path

    model = GumbelEcho()

    def fresh_state(lr):
        return create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
            tx=make_optimizer(lr),
        )

    batch = make_batch(4, s=8)
    batch["clean"] = np.zeros_like(batch["clean"])  # loss = mean|g + w|
    half0 = {k: v[:2] for k, v in batch.items()}
    half1 = {k: v[2:] for k, v in batch.items()}

    # fold-formula check at frozen params (lr=0 so step 1 sees the same w):
    # accum=2 folds indices {0,1} for its two microbatches; accum=1 folds
    # index s at step s. So accum2(batch) == mean(accum1(half0)@step0,
    # accum1(half1)@step1) exactly (same microbatch shapes -> same flax
    # rng derivation from each root key).
    step2 = jax.jit(make_train_step(model, stochastic=True, grad_accum=2))
    _, m2x = step2(fresh_state(0.0), batch)
    step1 = jax.jit(make_train_step(model, stochastic=True, grad_accum=1))
    st = fresh_state(0.0)
    st, ma = step1(st, half0)   # step 0 -> fold index 0
    st, mb = step1(st, half1)   # step 1 -> fold index 1
    np.testing.assert_allclose(
        float(m2x["train_loss"]),
        (float(ma["train_loss"]) + float(mb["train_loss"])) / 2,
        rtol=1e-6,
    )
    assert float(m2x["grad_norm"]) > 0  # grads flow through the draw

    # microbatches draw DIFFERENTLY: same data at fold 0 vs fold 1
    st2 = fresh_state(0.0)
    st2, mc = step1(st2, half0)  # fold 0
    st2, md = step1(st2, half0)  # fold 1, same data, same params (lr=0)
    assert float(mc["train_loss"]) != float(md["train_loss"])

    # identical runs -> identical stochastic update (keyed purely by
    # (seed, step, microbatch index), no hidden nondeterminism)
    s1, m1 = step2(fresh_state(1e-4), batch)
    s2, m2 = step2(fresh_state(1e-4), batch)
    np.testing.assert_array_equal(
        np.asarray(m1["train_loss"]), np.asarray(m2["train_loss"])
    )
    np.testing.assert_array_equal(
        np.asarray(s1.params["w"]), np.asarray(s2.params["w"])
    )
