"""TD3 trainer: twin critics, target-policy smoothing, delayed policy updates.

Reference: reagent/training/td3_trainer.py:30-215.  The delayed policy update
(every ``delayed_policy_update`` steps) is a ``lax.cond`` on the step counter
inside the single jitted train step.
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
from reagent_tpu.core.parameters import CONTINUOUS_TRAINING_ACTION_RANGE, RLParameters
from reagent_tpu.optim import make_optimizer, soft_update

Array = jax.Array


@struct.dataclass
class TD3TrainerState:
    actor_params: Any
    actor_target_params: Any
    q1_params: Any
    q1_target_params: Any
    actor_opt_state: Any
    q1_opt_state: Any
    rng: Array
    step: Array
    q2_params: Any = None
    q2_target_params: Any = None
    q2_opt_state: Any = None


class TD3Trainer:
    def __init__(
        self,
        actor_network: nn.Module,
        q1_network: nn.Module,
        q2_network: Optional[nn.Module] = None,
        rl: RLParameters = RLParameters(gamma=0.9, target_update_rate=0.005),
        q_network_optimizer: Any = None,
        actor_network_optimizer: Any = None,
        noise_variance: float = 0.2,
        noise_clip: float = 0.5,
        delayed_policy_update: int = 2,
    ) -> None:
        self.actor_network = actor_network
        self.q1_network = q1_network
        self.q2_network = q2_network
        self.rl = rl
        self.gamma = rl.gamma
        self.tau = rl.target_update_rate
        self.q_opt = make_optimizer(q_network_optimizer)
        self.actor_opt = make_optimizer(actor_network_optimizer)
        self.noise_variance = noise_variance
        self.noise_clip = noise_clip
        self.delayed_policy_update = delayed_policy_update

    def init(self, rng: Array, obs_proto: Array, action_proto: Array) -> TD3TrainerState:
        r_actor, r_q1, r_q2, r_state = jax.random.split(rng, 4)
        actor_params = self.actor_network.init(r_actor, obs_proto)
        q1_params = self.q1_network.init(r_q1, obs_proto, action_proto)
        state = TD3TrainerState(
            actor_params=actor_params,
            actor_target_params=jax.tree_util.tree_map(jnp.copy, actor_params),
            q1_params=q1_params,
            q1_target_params=jax.tree_util.tree_map(jnp.copy, q1_params),
            actor_opt_state=self.actor_opt.init(actor_params),
            q1_opt_state=self.q_opt.init(q1_params),
            rng=r_state,
            step=jnp.zeros((), jnp.int32),
        )
        if self.q2_network is not None:
            q2_params = self.q2_network.init(r_q2, obs_proto, action_proto)
            state = state.replace(
                q2_params=q2_params,
                q2_target_params=jax.tree_util.tree_map(jnp.copy, q2_params),
                q2_opt_state=self.q_opt.init(q2_params),
            )
        return state

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: TD3TrainerState, batch: rlt.PolicyNetworkInput
    ) -> Tuple[TD3TrainerState, Dict[str, Array]]:
        obs = batch.state.float_features
        action = batch.action.float_features
        next_obs = batch.next_state.float_features
        reward = batch.reward
        not_done = batch.not_terminal.astype(jnp.float32)
        lo, hi = CONTINUOUS_TRAINING_ACTION_RANGE

        rng, r_noise = jax.random.split(state.rng)

        # target with policy smoothing (ref td3_trainer.py:141-156)
        next_actor = self.actor_network.apply(state.actor_target_params, next_obs).action
        noise = jnp.clip(
            jax.random.normal(r_noise, next_actor.shape) * self.noise_variance,
            -self.noise_clip,
            self.noise_clip,
        )
        next_actor = jnp.clip(next_actor + noise, lo, hi)
        next_q = self.q1_network.apply(state.q1_target_params, next_obs, next_actor)
        if self.q2_network is not None:
            next_q = jnp.minimum(
                next_q, self.q2_network.apply(state.q2_target_params, next_obs, next_actor)
            )
        target_q = jax.lax.stop_gradient(reward + self.gamma * next_q * not_done)

        def q_loss_fn(params, net):
            return jnp.mean((net.apply(params, obs, action) - target_q) ** 2)

        q1_loss, q1_grads = jax.value_and_grad(q_loss_fn)(state.q1_params, self.q1_network)
        q1_up, q1_opt_state = self.q_opt.update(q1_grads, state.q1_opt_state, state.q1_params)
        q1_params = optax.apply_updates(state.q1_params, q1_up)

        q2_params, q2_opt_state, q2_loss = state.q2_params, state.q2_opt_state, jnp.asarray(0.0)
        if self.q2_network is not None:
            q2_loss, q2_grads = jax.value_and_grad(q_loss_fn)(state.q2_params, self.q2_network)
            q2_up, q2_opt_state = self.q_opt.update(q2_grads, state.q2_opt_state, state.q2_params)
            q2_params = optax.apply_updates(state.q2_params, q2_up)

        # Delayed actor + target update (ref :186-215).  Branchless: a
        # lax.cond here would poison any enclosing lax.scan's compile time on
        # TPU, so the update is always computed and blended by a 0/1 flag.
        flag = state.step % self.delayed_policy_update == 0

        def blend(new, old):
            # where (not arithmetic) so integer opt-state leaves keep dtype
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(flag, n, o), new, old
            )

        def actor_loss_fn(a_params):
            a = self.actor_network.apply(a_params, obs).action
            return -jnp.mean(self.q1_network.apply(q1_params, obs, a))

        actor_loss_raw, a_grads = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        a_up, new_actor_opt_state = self.actor_opt.update(
            a_grads, state.actor_opt_state, state.actor_params
        )
        actor_params = blend(
            optax.apply_updates(state.actor_params, a_up), state.actor_params
        )
        actor_opt_state = blend(new_actor_opt_state, state.actor_opt_state)
        actor_loss = jnp.where(flag, actor_loss_raw, 0.0)

        actor_target_params = blend(
            soft_update(actor_params, state.actor_target_params, self.tau),
            state.actor_target_params,
        )
        q1_target_params = blend(
            soft_update(q1_params, state.q1_target_params, self.tau),
            state.q1_target_params,
        )
        q2_target_params = (
            blend(
                soft_update(q2_params, state.q2_target_params, self.tau),
                state.q2_target_params,
            )
            if self.q2_network is not None
            else state.q2_target_params
        )

        new_state = state.replace(
            actor_params=actor_params,
            actor_target_params=actor_target_params,
            q1_params=q1_params,
            q1_target_params=q1_target_params,
            actor_opt_state=actor_opt_state,
            q1_opt_state=q1_opt_state,
            q2_params=q2_params,
            q2_target_params=q2_target_params,
            q2_opt_state=q2_opt_state,
            rng=rng,
            step=state.step + 1,
        )
        return new_state, {
            "q1_loss": q1_loss,
            "q2_loss": q2_loss,
            "actor_loss": actor_loss,
            "target_q_mean": jnp.mean(target_q),
        }
