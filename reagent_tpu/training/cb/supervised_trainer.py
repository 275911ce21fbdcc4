"""Supervised contextual-bandit trainer (plain regression on chosen arms).

Reference: reagent/training/cb/supervised_trainer.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from reagent_tpu.core import types as rlt
from reagent_tpu.optim import make_optimizer

Array = jax.Array


@struct.dataclass
class SupervisedTrainerState:
    params: Any
    opt_state: Any
    step: Array


class SupervisedTrainer:
    def __init__(self, network: nn.Module, optimizer: Any = None):
        self.network = network
        self.optimizer = make_optimizer(optimizer)

    def init(self, rng: Array, x_proto: Array) -> SupervisedTrainerState:
        params = self.network.init(rng, x_proto)
        return SupervisedTrainerState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: SupervisedTrainerState, batch: rlt.CBInput
    ) -> Tuple[SupervisedTrainerState, Dict[str, Array]]:
        row = jnp.arange(batch.context_arm_features.shape[0])
        x = batch.context_arm_features[row, batch.action.reshape(-1)]
        y = batch.reward.reshape(-1, 1)

        def loss_fn(params):
            pred = self.network.apply(params, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss},
        )
