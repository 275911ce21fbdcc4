"""Reward-model trainer (for slates and bandit reward models).

Reference: reagent/training/reward_network_trainer.py:70 — MSE / MAE / BCE /
weighted-MSE losses, optional inverse-propensity sample weights and target
outlier filtering.
"""

from __future__ import annotations

import enum
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from reagent_tpu.core import types as rlt
from reagent_tpu.optim import make_optimizer

Array = jax.Array


class LossFunction(enum.Enum):
    MSE = "MSE_Loss"
    SmoothL1Loss = "SmoothL1_Loss"
    L1Loss = "L1_Loss"
    BCELoss = "BCE_Loss"


def _elementwise_loss(loss_type: LossFunction, pred: Array, target: Array) -> Array:
    if loss_type == LossFunction.MSE:
        return (pred - target) ** 2
    if loss_type == LossFunction.L1Loss:
        return jnp.abs(pred - target)
    if loss_type == LossFunction.SmoothL1Loss:
        d = jnp.abs(pred - target)
        return jnp.where(d < 1.0, 0.5 * d**2, d - 0.5)
    if loss_type == LossFunction.BCELoss:
        return optax.sigmoid_binary_cross_entropy(pred, target)
    raise ValueError(loss_type)


@struct.dataclass
class RewardNetTrainerState:
    params: Any
    opt_state: Any
    step: Array


class RewardNetTrainer:
    def __init__(
        self,
        reward_net: nn.Module,  # (state, action-like input) -> reward
        optimizer: Any = None,
        loss_type: LossFunction = LossFunction.MSE,
        reward_ignore_threshold: Optional[float] = None,
        weighted_by_inverse_propensity: bool = False,
    ):
        self.reward_net = reward_net
        self.optimizer = make_optimizer(optimizer)
        self.loss_type = loss_type
        self.reward_ignore_threshold = reward_ignore_threshold
        self.weighted_by_inverse_propensity = weighted_by_inverse_propensity

    def init(self, rng: Array, *protos) -> RewardNetTrainerState:
        params = self.reward_net.init(rng, *protos)
        return RewardNetTrainerState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: RewardNetTrainerState, batch
    ) -> Tuple[RewardNetTrainerState, Dict[str, Array]]:
        if isinstance(batch, rlt.PreprocessedRankingInput):
            target = batch.slate_reward.reshape(-1, 1)
            inputs = (batch.state.float_features, batch.src_seq.float_features)
            weight = (
                1.0 / jnp.clip(batch.tgt_out_probs.reshape(-1, 1), 1e-6)
                if self.weighted_by_inverse_propensity
                else None
            )
        else:
            target = batch.reward.reshape(-1, 1)
            inputs = (batch.state.float_features,)
            weight = None

        def loss_fn(params):
            pred = self.reward_net.apply(params, *inputs).reshape(-1, 1)
            per_ex = _elementwise_loss(self.loss_type, pred, target)
            if weight is not None:
                per_ex = per_ex * weight
            if self.reward_ignore_threshold is not None:
                keep = (target <= self.reward_ignore_threshold).astype(jnp.float32)
                return jnp.sum(per_ex * keep) / jnp.maximum(jnp.sum(keep), 1.0), pred
            return jnp.mean(per_ex), pred

        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "pred_reward_mean": jnp.mean(pred)},
        )
