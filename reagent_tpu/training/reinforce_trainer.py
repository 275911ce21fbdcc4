"""REINFORCE trainer (on- and off-policy with clamped IS weights).

Reference: reagent/training/reinforce_trainer.py:93-149.
"""

from __future__ import annotations

import functools
import math
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
class ReinforceTrainerState:
    policy_params: Any
    opt_state: Any
    step: Array
    value_params: Any = None
    value_opt_state: Any = None


class ReinforceTrainer:
    def __init__(
        self,
        scorer: nn.Module,  # state -> action logits
        sampler,  # provides log_prob(scores, onehot_action)
        gamma: float = 0.0,
        optimizer: Any = None,
        optimizer_value_net: Any = None,
        off_policy: bool = False,
        reward_clip: float = 1e6,
        clip_param: float = 1e6,
        normalize: bool = True,
        subtract_mean: bool = True,
        offset_clamp_min: bool = False,
        value_net: Optional[nn.Module] = None,
    ) -> None:
        self.scorer = scorer
        self.sampler = sampler
        self.gamma = gamma
        self.off_policy = off_policy
        self.reward_clip = reward_clip
        self.clip_param = clip_param
        self.normalize = normalize
        self.subtract_mean = subtract_mean
        self.offset_clamp_min = offset_clamp_min
        self.value_net = value_net
        if value_net is not None:
            assert not (normalize or subtract_mean), (
                "Can't use a value baseline and reward normalization at once"
            )
        self.optimizer = make_optimizer(optimizer)
        self.value_optimizer = make_optimizer(optimizer_value_net)

    def init(self, rng: Array, obs_proto: Array) -> ReinforceTrainerState:
        r1, r2 = jax.random.split(rng)
        policy_params = self.scorer.init(r1, obs_proto)
        state = ReinforceTrainerState(
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
        self, state: ReinforceTrainerState, batch: rlt.PolicyGradientInput
    ) -> Tuple[ReinforceTrainerState, Dict[str, Array]]:
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
        elif self.subtract_mean:
            n = jnp.maximum(jnp.sum(mask), 1.0)
            offset = offset - jnp.sum(offset * mask) / n
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

        def loss_fn(params):
            scores = self.scorer.apply(params, obs)
            if batch.possible_actions_mask is not None:
                scores = scores + jnp.log(
                    jnp.clip(batch.possible_actions_mask, 1e-20, 1.0)
                )
            log_prob = self.sampler.log_prob(scores, batch.action)
            if self.off_policy:
                eligibility = jnp.exp(
                    jnp.clip(
                        log_prob - batch.log_prob.reshape(-1),
                        None,
                        math.log(float(self.clip_param)),
                    )
                )
            else:
                eligibility = log_prob
            return -jnp.dot(offset, eligibility), jnp.mean(eligibility)

        (loss, elig_mean), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.policy_params
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.policy_params
        )
        policy_params = optax.apply_updates(state.policy_params, updates)
        return (
            state.replace(
                policy_params=policy_params,
                opt_state=opt_state,
                value_params=value_params,
                value_opt_state=value_opt_state,
                step=state.step + 1,
            ),
            {"loss": loss, "value_loss": value_loss, "eligibility_mean": elig_mean},
        )
