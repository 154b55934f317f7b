"""Train state: params + batch-norm stats + Adam optimizer with a mutable
learning rate (so the host-side plateau scheduler can adjust it without
recompiling — reference uses torch ReduceLROnPlateau, training_lit.py:53-55).
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: t.Any = None


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with torch defaults (betas 0.9/0.999, eps 1e-8 — reference
    training_lit.py:51) and an injectable learning rate."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def create_train_state(
    model: nn.Module,
    rng: jax.Array,
    sample_img: jax.Array,
    lr: float,
) -> TrainState:
    variables = jax.jit(
        lambda k, x: model.init(k, x, train=True), static_argnums=()
    )(rng, sample_img)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=make_optimizer(lr),
        batch_stats=batch_stats,
    )


def get_lr(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    opt_state = state.opt_state
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hyperparams))


def param_count(state: TrainState) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(state.params))
