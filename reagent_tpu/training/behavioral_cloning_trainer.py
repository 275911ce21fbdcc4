"""Behavioral-cloning trainer (cross-entropy on logged actions).

Reference: reagent/training/behavioral_cloning_trainer.py:18.
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
class BehavioralCloningTrainerState:
    params: Any
    opt_state: Any
    step: Array


class BehavioralCloningTrainer:
    def __init__(self, bc_net: nn.Module, optimizer: Any = None):
        self.bc_net = bc_net
        self.optimizer = make_optimizer(optimizer)

    def init(self, rng: Array, obs_proto: Array) -> BehavioralCloningTrainerState:
        params = self.bc_net.init(rng, obs_proto)
        return BehavioralCloningTrainerState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: BehavioralCloningTrainerState, batch: rlt.BehavioralCloningModelInput
    ) -> Tuple[BehavioralCloningTrainerState, Dict[str, Array]]:
        labels = jnp.argmax(batch.action, axis=1)

        def loss_fn(params):
            logits = self.bc_net.apply(params, batch.state.float_features)
            if batch.possible_actions_mask is not None:
                logits = logits + jnp.log(
                    jnp.clip(batch.possible_actions_mask, 1e-20, 1.0)
                )
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )
            acc = jnp.mean((jnp.argmax(logits, 1) == labels).astype(jnp.float32))
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "accuracy": acc},
        )
