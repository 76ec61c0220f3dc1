"""Train state and optimizer construction.

Optimizer parity: torch `optim.AdamW(params, lr=2e-4)` with torch defaults
betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01 applied to *all* params
(/root/reference/train.py:52-53). The learning rate is injected as mutable
optimizer state so the per-epoch schedule (train.py:48-56 semantics) never
triggers a recompile.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    epoch: jnp.ndarray = None  # scalar int32, for checkpoint/resume


def make_optimizer(
    learning_rate: float = 2e-4,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate,
        b1=b1,
        b2=b2,
        eps=eps,
        weight_decay=weight_decay,
    )
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    variables = model.init(rng, sample_input)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx if tx is not None else make_optimizer(),
        epoch=jnp.zeros((), jnp.int32),
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected learning-rate hyperparam inside opt_state."""

    def update(os):
        if hasattr(os, "hyperparams"):
            hp = dict(os.hyperparams)
            old = hp["learning_rate"]
            new = jnp.asarray(lr, jnp.float32)
            if getattr(old, "committed", False):
                # mirror the committed placement so the jitted step's
                # lowering cache still hits (no per-epoch recompile)
                new = jax.device_put(new, old.sharding)
            hp["learning_rate"] = new
            return os._replace(hyperparams=hp)
        return os

    opt_state = jax.tree_util.tree_map(
        lambda x: x, state.opt_state
    )  # shallow copy via identity
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "hyperparams"):
        new = tuple(update(os) for os in opt_state)
    else:
        new = update(opt_state)
    return state.replace(opt_state=new)
