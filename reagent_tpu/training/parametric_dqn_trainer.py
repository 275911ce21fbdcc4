"""Parametric-action DQN trainer (Q(s, a) over feature-vector actions).

Reference: reagent/training/parametric_dqn_trainer.py:111-200.
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
from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.optim import make_optimizer, soft_update
from reagent_tpu.training.rl_trainer_base import (
    compute_discount_tensor,
    get_max_q_values_with_target,
    q_network_loss_fn,
)

Array = jax.Array


@struct.dataclass
class ParametricDQNTrainerState:
    q_params: Any
    q_target_params: Any
    opt_state: Any
    step: Array
    reward_params: Any = None
    reward_opt_state: Any = None


class ParametricDQNTrainer:
    def __init__(
        self,
        q_network: nn.Module,  # (state, action) -> [B, 1]
        rl: RLParameters = RLParameters(),
        double_q_learning: bool = True,
        optimizer: Any = None,
        reward_network: Optional[nn.Module] = None,
    ) -> None:
        self.q_network = q_network
        self.rl = rl
        self.gamma = rl.gamma
        self.tau = rl.target_update_rate
        self.maxq_learning = rl.maxq_learning
        self.double_q_learning = double_q_learning
        self.optimizer = make_optimizer(optimizer)
        self.loss_fn = q_network_loss_fn(rl.q_network_loss)
        self.reward_network = reward_network

    def init(self, rng: Array, obs_proto: Array, action_proto: Array) -> ParametricDQNTrainerState:
        r1, r2 = jax.random.split(rng)
        q_params = self.q_network.init(r1, obs_proto, action_proto)
        state = ParametricDQNTrainerState(
            q_params=q_params,
            q_target_params=jax.tree_util.tree_map(jnp.copy, q_params),
            opt_state=self.optimizer.init(q_params),
            step=jnp.zeros((), jnp.int32),
        )
        if self.reward_network is not None:
            reward_params = self.reward_network.init(r2, obs_proto, action_proto)
            state = state.replace(
                reward_params=reward_params,
                reward_opt_state=self.optimizer.init(reward_params),
            )
        return state

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: ParametricDQNTrainerState, batch: rlt.ParametricDqnInput
    ) -> Tuple[ParametricDQNTrainerState, Dict[str, Array]]:
        reward = batch.reward
        not_terminal = batch.not_terminal.astype(jnp.float32)
        discount = compute_discount_tensor(
            batch, self.gamma, self.rl.use_seq_num_diff_as_time_diff, self.rl.multi_steps
        )
        obs = batch.state.float_features

        if self.maxq_learning:
            # possible_next_actions: [B * max_num_action, k] (tiled layout)
            pna = batch.possible_next_actions.float_features
            B = batch.possible_next_actions_mask.shape[0]
            max_num_action = pna.shape[0] // B
            tiled_next = batch.next_state.get_tiled_batch(max_num_action).float_features
            all_next_q = self.q_network.apply(state.q_params, tiled_next, pna)
            all_next_q_t = self.q_network.apply(state.q_target_params, tiled_next, pna)
            next_q, _ = get_max_q_values_with_target(
                all_next_q,
                all_next_q_t,
                batch.possible_next_actions_mask.astype(jnp.float32),
                self.double_q_learning,
            )
        else:  # SARSA on logged next action via target net
            next_q = self.q_network.apply(
                state.q_target_params,
                batch.next_state.float_features,
                batch.next_action.float_features,
            )
        target_q = jax.lax.stop_gradient(reward + not_terminal * discount * next_q)

        def loss(params):
            q = self.q_network.apply(params, obs, batch.action.float_features)
            return self.loss_fn(q, target_q), jnp.mean(q)

        (td_loss, q_mean), grads = jax.value_and_grad(loss, has_aux=True)(state.q_params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.q_params)
        q_params = optax.apply_updates(state.q_params, updates)

        metrics = {"td_loss": td_loss, "q_mean": q_mean}
        reward_params, reward_opt_state = state.reward_params, state.reward_opt_state
        if self.reward_network is not None:
            def r_loss_fn(rp):
                pred = self.reward_network.apply(rp, obs, batch.action.float_features)
                return jnp.mean((pred - reward) ** 2)

            r_loss, r_grads = jax.value_and_grad(r_loss_fn)(state.reward_params)
            r_up, reward_opt_state = self.optimizer.update(
                r_grads, state.reward_opt_state, state.reward_params
            )
            reward_params = optax.apply_updates(state.reward_params, r_up)
            metrics["reward_loss"] = r_loss

        return (
            state.replace(
                q_params=q_params,
                q_target_params=soft_update(q_params, state.q_target_params, self.tau),
                opt_state=opt_state,
                reward_params=reward_params,
                reward_opt_state=reward_opt_state,
                step=state.step + 1,
            ),
            metrics,
        )
