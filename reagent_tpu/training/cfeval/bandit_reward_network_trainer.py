"""Bandit reward-model trainer for counterfactual evaluation.

Reference: reagent/training/cfeval/bandit_reward_network_trainer.py:21 — fit
r_hat(s, a) on logged BanditRewardModelInput, optionally IPS-weighted.
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
from reagent_tpu.training.reward_network_trainer import LossFunction, _elementwise_loss

Array = jax.Array


@struct.dataclass
class BanditRewardNetTrainerState:
    params: Any
    opt_state: Any
    step: Array


class BanditRewardNetTrainer:
    def __init__(
        self,
        reward_net: nn.Module,  # state -> [B, num_actions] reward predictions
        optimizer: Any = None,
        loss_type: LossFunction = LossFunction.MSE,
        weighted_by_inverse_propensity: bool = False,
    ):
        self.reward_net = reward_net
        self.optimizer = make_optimizer(optimizer)
        self.loss_type = loss_type
        self.weighted_by_inverse_propensity = weighted_by_inverse_propensity

    def init(self, rng: Array, obs_proto: Array) -> BanditRewardNetTrainerState:
        params = self.reward_net.init(rng, obs_proto)
        return BanditRewardNetTrainerState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: BanditRewardNetTrainerState, batch: rlt.BanditRewardModelInput
    ) -> Tuple[BanditRewardNetTrainerState, Dict[str, Array]]:
        action = batch.action  # one-hot [B, A]
        target = batch.reward.reshape(-1, 1)
        weight = None
        if self.weighted_by_inverse_propensity and batch.action_prob is not None:
            weight = 1.0 / jnp.clip(batch.action_prob.reshape(-1, 1), 1e-6)

        def loss_fn(params):
            pred_all = self.reward_net.apply(params, batch.state.float_features)
            pred = jnp.sum(pred_all * action, axis=1, keepdims=True)
            per_ex = _elementwise_loss(self.loss_type, pred, target)
            if weight is not None:
                per_ex = per_ex * weight
            return jnp.mean(per_ex), pred

        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "pred_reward_mean": jnp.mean(pred)},
        )
