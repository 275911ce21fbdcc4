"""PPO trainer (clipped surrogate objective, optional value baseline/entropy).

Reference: reagent/training/ppo_trainer.py:34-160.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from reagent_tpu.core import types as rlt
from reagent_tpu.optim import make_optimizer
from reagent_tpu.training.utils import discounted_returns, masked_whiten

Array = jax.Array


@struct.dataclass
class PPOTrainerState:
    policy_params: Any
    opt_state: Any
    step: Array
    value_params: Any = None
    value_opt_state: Any = None


class PPOTrainer:
    def __init__(
        self,
        scorer: nn.Module,
        sampler,
        gamma: float = 0.0,
        optimizer: Any = None,
        optimizer_value_net: Any = None,
        reward_clip: float = 1e6,
        normalize: bool = True,
        subtract_mean: bool = True,
        offset_clamp_min: bool = False,
        update_epochs: int = 1,
        ppo_epsilon: float = 0.2,
        entropy_weight: float = 0.0,
        value_net: Optional[nn.Module] = None,
    ) -> None:
        assert 0 <= ppo_epsilon <= 1, "ppo_epsilon must be in [0, 1]"
        self.scorer = scorer
        self.sampler = sampler
        self.gamma = gamma
        self.reward_clip = reward_clip
        self.normalize = normalize
        self.subtract_mean = subtract_mean
        self.offset_clamp_min = offset_clamp_min
        self.update_epochs = update_epochs
        self.ppo_epsilon = ppo_epsilon
        self.entropy_weight = entropy_weight
        self.value_net = value_net
        if value_net is not None:
            assert not normalize, (
                "Can't apply a value baseline and normalize rewards simultaneously"
            )
        self.optimizer = make_optimizer(optimizer)
        self.value_optimizer = make_optimizer(optimizer_value_net)

    def init(self, rng: Array, obs_proto: Array) -> PPOTrainerState:
        r1, r2 = jax.random.split(rng)
        policy_params = self.scorer.init(r1, obs_proto)
        state = PPOTrainerState(
            policy_params=policy_params,
            opt_state=self.optimizer.init(policy_params),
            step=jnp.zeros((), jnp.int32),
        )
        if self.value_net is not None:
            value_params = self.value_net.init(r2, obs_proto)
            state = state.replace(
                value_params=value_params,
                value_opt_state=self.value_optimizer.init(value_params),
            )
        return state

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: PPOTrainerState, batch: rlt.PolicyGradientInput
    ) -> Tuple[PPOTrainerState, Dict[str, Array]]:
        obs = batch.state.float_features
        rewards = batch.reward.reshape(-1)
        mask = (
            jnp.ones_like(rewards)
            if batch.valid_mask is None
            else batch.valid_mask.reshape(-1).astype(jnp.float32)
        )
        offset = discounted_returns(
            jnp.clip(rewards, None, self.reward_clip) * mask, self.gamma
        )
        if self.normalize:
            offset = masked_whiten(offset, mask, self.subtract_mean)
        if self.offset_clamp_min:
            offset = jnp.clip(offset, 0, None)
        offset = offset * mask

        value_loss = jnp.asarray(0.0)
        value_params, value_opt_state = state.value_params, state.value_opt_state
        if self.value_net is not None:
            def v_loss_fn(vp):
                baselines = self.value_net.apply(vp, obs).reshape(-1)
                return (
                    jnp.sum(mask * (baselines - offset) ** 2)
                    / jnp.maximum(jnp.sum(mask), 1.0)
                ), baselines

            (value_loss, baselines), v_grads = jax.value_and_grad(
                v_loss_fn, has_aux=True
            )(state.value_params)
            v_up, value_opt_state = self.value_optimizer.update(
                v_grads, state.value_opt_state, state.value_params
            )
            value_params = optax.apply_updates(state.value_params, v_up)
            offset = (offset - jax.lax.stop_gradient(baselines)) * mask

        offset = jax.lax.stop_gradient(offset)
        behavior_log_prob = jax.lax.stop_gradient(batch.log_prob.reshape(-1))

        def ppo_loss_fn(params):
            scores = self.scorer.apply(params, obs)
            if batch.possible_actions_mask is not None:
                scores = scores + jnp.log(
                    jnp.clip(batch.possible_actions_mask, 1e-20, 1.0)
                )
            target_log_prob = self.sampler.log_prob(scores, batch.action)
            ratio = jnp.exp(target_log_prob - behavior_log_prob)
            unclipped = jnp.dot(offset, ratio)
            clipped = jnp.dot(
                offset, jnp.clip(ratio, 1 - self.ppo_epsilon, 1 + self.ppo_epsilon)
            )
            loss = -jnp.minimum(unclipped, clipped)
            if self.entropy_weight != 0:
                loss = loss - self.entropy_weight * jnp.sum(self.sampler.entropy(scores))
            return loss, jnp.mean(ratio)

        policy_params, opt_state = state.policy_params, state.opt_state
        loss = jnp.asarray(0.0)
        ratio_mean = jnp.asarray(1.0)
        for _ in range(self.update_epochs):
            (loss, ratio_mean), grads = jax.value_and_grad(ppo_loss_fn, has_aux=True)(
                policy_params
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, policy_params)
            policy_params = optax.apply_updates(policy_params, updates)

        return (
            state.replace(
                policy_params=policy_params,
                opt_state=opt_state,
                value_params=value_params,
                value_opt_state=value_opt_state,
                step=state.step + 1,
            ),
            {"ppo_loss": loss, "value_loss": value_loss, "ratio_mean": ratio_mean},
        )
