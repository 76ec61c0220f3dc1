"""Jitted training/eval steps over a data-parallel mesh.

The reference's per-step loop (forward -> L1 -> backward -> DDP all-reduce
-> AdamW, /root/reference/train.py:37-56) becomes one jitted function:
batches arrive sharded over the mesh's `data` axis, parameters are
replicated, and XLA inserts the gradient `psum` over ICI when computing
replicated updates from sharded activations — the TPU-native equivalent of
NCCL DDP with zero explicit collective code.

Models returning auxiliary routing losses (CAMixer family) plug in via
`aux_loss_fn`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from promptir_tpu.parallel.mesh import batch_sharding, replicated
from promptir_tpu.train.losses import l1_loss


def make_train_step(
    model,
    aux_loss_fn: Optional[Callable] = None,
    stochastic: bool = False,
    seed: int = 0,
    grad_accum: int = 1,
):
    """Build `step(state, batch) -> (state, metrics)`.

    `batch`: {"degraded": NHWC, "clean": NHWC, "de_type": (B,)}.

    `stochastic=True` is for models whose training forward samples (the
    CAMixer family's Gumbel routing — the reference's
    train_capromptxrestormer.py:54-63 / train_catapromptxrestormer.py
    semantics): the model is applied with deterministic=False and a
    per-step 'gumbel' rng folded from the global step; any auxiliary
    outputs (ratio losses) are summed into the loss via `aux_loss_fn`
    (default: plain sum, matching `loss = L1 + ratio_loss`).

    `grad_accum > 1` splits the batch into that many equal microbatches
    and runs them through a `lax.scan` (one resident activation set,
    grads averaged, a single optimizer update) — how the reference's
    4-GPU global batch (6/GPU x 4, /root/reference/train.py:334-341) is
    reproduced on fewer chips without extra activation memory. Equal
    microbatch sizes make the mean-of-means L1 equal the full-batch mean,
    so the update matches the unaccumulated step to float tolerance.
    """

    def loss_fn(params, mbatch, step_no, midx):
        if stochastic:
            # one Gumbel draw per (step, microbatch); reduces to the
            # plain per-step fold when grad_accum == 1
            rng = jax.random.fold_in(
                jax.random.PRNGKey(seed), step_no * grad_accum + midx
            )
            out = model.apply(
                {"params": params}, mbatch["degraded"], False,
                rngs={"gumbel": rng},
            )
        else:
            out = model.apply({"params": params}, mbatch["degraded"])
        if isinstance(out, tuple):
            restored, *aux = out
        else:
            restored, aux = out, ()
        loss = l1_loss(restored, mbatch["clean"])
        if aux:
            if aux_loss_fn is not None:
                loss = loss + aux_loss_fn(*aux)
            else:
                loss = loss + sum(aux)
        return loss

    def step(state, batch):
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, state.step, 0
            )
        else:
            # Row-to-microbatch grouping is arbitrary: equal sizes + loss
            # linearity make the averaged grads grouping-invariant. Under a
            # DP batch sharding GSPMD may reshard this reshape with an
            # all-to-all of the input batch (a few MB at 128px patches —
            # negligible next to the step), so no mesh-aware layout is
            # needed here.
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape(
                    grad_accum, x.shape[0] // grad_accum, *x.shape[1:]
                ),
                batch,
            )

            def body(carry, xs):
                mb, midx = xs
                l, g = jax.value_and_grad(loss_fn)(
                    state.params, mb, state.step, midx
                )
                acc_l, acc_g = carry
                return (
                    acc_l + l,
                    jax.tree_util.tree_map(jnp.add, acc_g, g),
                ), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros(()), zeros), (micro, jnp.arange(grad_accum))
            )
            inv = 1.0 / grad_accum
            loss = loss * inv
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        new_state = state.apply_gradients(grads=grads)
        metrics = {
            "train_loss": loss,
            "grad_norm": optax_global_norm(grads),
        }
        return new_state, metrics

    return step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def jit_train_step(step, mesh):
    """Compile the step for a mesh: replicated state, data-sharded batch."""
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, {"degraded": shard, "clean": shard, "de_type": shard}),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_eval_step(model):
    def eval_step(params, degraded):
        out = model.apply({"params": params}, degraded)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.clip(out, 0.0, 1.0)

    return jax.jit(eval_step)
