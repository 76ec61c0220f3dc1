"""Data-parallel training-step tests on the 8-device virtual CPU mesh.

This is the fake-backend validation of the framework's DDP equivalent
(reference: Lightning DDP, /root/reference/train.py:339): batches sharded
over the `data` axis must produce bit-identical losses and replicated
updates vs a single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from promptir_tpu.models import create_model
from promptir_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from promptir_tpu.train.state import (
    create_train_state,
    make_optimizer,
    set_learning_rate,
)
from promptir_tpu.train.step import jit_train_step, make_train_step


def tiny_model():
    return create_model(
        "promptir", dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
        decoder=False,
    )


def make_batch(n=8):
    rng = np.random.default_rng(0)
    return {
        "degraded": rng.uniform(size=(n, 32, 32, 3)).astype(np.float32),
        "clean": rng.uniform(size=(n, 32, 32, 3)).astype(np.float32),
        "de_type": np.zeros(n, np.int32),
    }


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_dp_step_matches_single_device():
    model = tiny_model()
    batch = make_batch(8)

    # single-device ground truth
    state1 = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    step1 = make_train_step(model)
    state1b, m1 = jax.jit(step1)(state1, batch)

    # 8-way data parallel
    mesh = create_mesh()
    assert mesh.devices.shape == (8, 1)
    state8 = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    state8 = jax.device_put(state8, replicated(mesh))
    shard = batch_sharding(mesh)
    batch8 = {k: jax.device_put(v, shard) for k, v in batch.items()}
    step8 = jit_train_step(make_train_step(model), mesh)
    state8b, m8 = step8(state8, batch8)

    # cross-device psum reduces in a different order than a single-device
    # mean; agreement is to float32 reduction noise, not bit-exact.
    np.testing.assert_allclose(
        float(m1["train_loss"]), float(m8["train_loss"]), rtol=1e-5
    )
    # parameter updates agree across the replication
    l1 = jax.tree_util.tree_leaves(state1b.params)[0]
    l8 = jax.tree_util.tree_leaves(state8b.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_set_learning_rate_no_recompile():
    model = tiny_model()
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)),
        tx=make_optimizer(learning_rate=2e-4),
    )
    step = jax.jit(make_train_step(model))
    batch = make_batch(2)
    # two warmup calls: the first lowers for host-numpy inputs, the second
    # for device-array inputs; the cache is stable after that.
    state, _ = step(state, batch)
    state, _ = step(state, batch)
    before = step._cache_size() if hasattr(step, "_cache_size") else None
    state = set_learning_rate(state, 1e-4)
    state, _ = step(state, batch)
    if before is not None:
        assert step._cache_size() == before
    # lr actually took effect in the optimizer state
    hp = state.opt_state
    if not hasattr(hp, "hyperparams"):
        hp = next(x for x in hp if hasattr(x, "hyperparams"))
    assert float(hp.hyperparams["learning_rate"]) == pytest.approx(1e-4)


@pytest.mark.slow
def test_sharded_tiled_inference_matches_single():
    """Tile-batch data parallelism over the mesh reproduces the single-chip
    tiled result on one oversized image."""
    import flax.linen as nn

    from promptir_tpu.eval.tiling import tiled_inference

    class _Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
            return nn.Conv(3, (3, 3), padding="SAME")(x)

    net = _Net()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1, 200, 312, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x[:, :64, :64])
    fn = lambda p, t: net.apply(p, t)  # noqa: E731

    y_single = tiled_inference(fn, params, x, tile=64, overlap=16)
    mesh = create_mesh()
    params_r = jax.device_put(params, replicated(mesh))
    y_mesh = tiled_inference(fn, params_r, x, tile=64, overlap=16, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(y_mesh), np.asarray(y_single), rtol=1e-6, atol=1e-6
    )


@pytest.mark.slow
def test_tp_gdfn_matches_module():
    """Gate-aware megatron TP of the GDFN matmul pair (parallel/tp.py):
    column-parallel W1 (same slice of both gate halves per chip, local
    gelu/dwconv), row-parallel W2 with one psum — must match the module."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from promptir_tpu.ops.gdfn import GDFN
    from promptir_tpu.parallel.mesh import create_mesh
    from promptir_tpu.parallel.tp import tp_gdfn_apply

    m = GDFN(48, 2.66, use_bias=False)
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 8, 8, 48)).astype(np.float32)
    )
    params = m.init(jax.random.PRNGKey(0), x)
    y_ref = m.apply(params, x)

    mesh = create_mesh(n_data=1, n_model=8)
    y_tp = tp_gdfn_apply(params["params"], x, mesh, axis="model")
    np.testing.assert_allclose(
        np.asarray(y_tp), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )

    # biased GDFN through the prepare-once/apply-many path: project_in /
    # dwconv biases ride the gate-aware column split, the output bias is
    # added once after the psum
    from promptir_tpu.parallel.tp import prepare_tp_gdfn

    mb = GDFN(48, 2.66, use_bias=True)
    pb = mb.init(jax.random.PRNGKey(1), x)
    pb = jax.tree.map(
        lambda a: a + 0.05 if a.ndim == 1 else a, pb
    )  # non-zero biases so a dropped bias would be caught
    apply = prepare_tp_gdfn(pb["params"], mesh, axis="model")
    np.testing.assert_allclose(
        np.asarray(apply(x)), np.asarray(mb.apply(pb, x)),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.slow
def test_tp_mdta_matches_module():
    """Head-parallel megatron TP of MDTA (parallel/tp.py): each chip owns
    a head slab of the qkv columns, computes its L2 norms / channel Gram /
    softmax / attention-apply locally, and the row-parallel out-projection
    is reduced with one psum — must match the module."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from promptir_tpu.ops.attention import MDTA
    from promptir_tpu.parallel.mesh import create_mesh
    from promptir_tpu.parallel.tp import tp_mdta_apply

    m = MDTA(48, num_heads=8, use_bias=False)
    x = jnp.asarray(
        np.random.default_rng(8).normal(size=(2, 8, 8, 48)).astype(np.float32)
    )
    params = m.init(jax.random.PRNGKey(0), x)
    y_ref = m.apply(params, x)

    mesh = create_mesh(n_data=1, n_model=8)
    y_tp = tp_mdta_apply(params["params"], x, 8, mesh, axis="model")
    np.testing.assert_allclose(
        np.asarray(y_tp), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )

    # biased MDTA through prepare-once/apply-many (qkv/dwconv biases take
    # the head-slab split, the out-proj bias is added after the psum)
    from promptir_tpu.parallel.tp import prepare_tp_mdta

    mb = MDTA(48, num_heads=8, use_bias=True)
    pb = mb.init(jax.random.PRNGKey(1), x)
    pb = jax.tree.map(lambda a: a + 0.05 if a.ndim == 1 else a, pb)
    apply = prepare_tp_mdta(pb["params"], 8, mesh, axis="model")
    np.testing.assert_allclose(
        np.asarray(apply(x)), np.asarray(mb.apply(pb, x)),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.slow
def test_grad_accum_matches_full_batch():
    """grad_accum=4 (scan-accumulated microbatches, one optimizer update)
    must produce the same update as the full-batch step: equal microbatch
    sizes make the mean-of-means L1 equal the full-batch mean. Also run
    the accumulated step over the 8-device DP mesh — reshape-to-microbatch
    must compose with the batch sharding."""
    model = tiny_model()
    batch = make_batch(8)

    state_full = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    full_b, m_full = jax.jit(make_train_step(model))(state_full, batch)

    state_acc = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    acc_b, m_acc = jax.jit(make_train_step(model, grad_accum=4))(
        state_acc, batch
    )

    np.testing.assert_allclose(
        float(m_full["train_loss"]), float(m_acc["train_loss"]), rtol=1e-6
    )
    for lf, la in zip(
        jax.tree_util.tree_leaves(full_b.params),
        jax.tree_util.tree_leaves(acc_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(la), rtol=1e-5, atol=1e-6
        )

    # sharded: 8-way DP x 4 microbatches of 16 rows (2 per device each)
    mesh = create_mesh()
    big = make_batch(64)
    state8 = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    state8 = jax.device_put(state8, replicated(mesh))
    shard = batch_sharding(mesh)
    big8 = {k: jax.device_put(v, shard) for k, v in big.items()}
    step8 = jit_train_step(make_train_step(model, grad_accum=4), mesh)
    state8b, m8 = step8(state8, big8)

    state1 = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    state1b, m1 = jax.jit(make_train_step(model))(state1, big)
    np.testing.assert_allclose(
        float(m1["train_loss"]), float(m8["train_loss"]), rtol=1e-5
    )
    l1 = jax.tree_util.tree_leaves(state1b.params)[0]
    l8 = jax.tree_util.tree_leaves(state8b.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), rtol=1e-5, atol=1e-6)
