"""C51 (categorical distributional DQN) trainer.

Reference: reagent/training/c51_trainer.py:100-190 — categorical projection of
the Bellman-updated support onto the fixed atom grid, cross-entropy loss.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.models.categorical_dqn import CategoricalDQN
from reagent_tpu.optim import make_optimizer, soft_update
from reagent_tpu.training.rl_trainer_base import (
    ACTION_NOT_POSSIBLE_VAL,
    boost_rewards,
    compute_discount_tensor,
    reward_boost_array,
)

Array = jax.Array


@struct.dataclass
class C51TrainerState:
    q_params: Any
    q_target_params: Any
    opt_state: Any
    step: Array


def categorical_projection(
    next_dist: Array, target_q: Array, qmin: float, qmax: float, num_atoms: int
) -> Array:
    """Project target distribution onto the atom grid (ref c51_trainer.py:138-166).

    next_dist [B, N] probabilities at atoms; target_q [B, N] = r + gamma*support.
    """
    scale = (qmax - qmin) / (num_atoms - 1)
    target_q = jnp.clip(target_q, qmin, qmax)
    b = (target_q - qmin) / scale
    lo = jnp.floor(b).astype(jnp.int32)
    up = jnp.ceil(b).astype(jnp.int32)
    # corner-case adjustment so l == u still contributes mass (ref :148-158)
    lo = jnp.where((up > 0) & (lo == up), lo - 1, lo)
    up = jnp.where((lo < num_atoms - 1) & (lo == up), up + 1, up)

    m_lo = next_dist * (up.astype(jnp.float32) - b)
    m_up = next_dist * (b - lo.astype(jnp.float32))
    # scatter-add per row via one-hot matmul (MXU-friendly, static shapes)
    lo_oh = jax.nn.one_hot(lo, num_atoms)  # [B, N, A]
    up_oh = jax.nn.one_hot(up, num_atoms)
    m = jnp.einsum("bn,bna->ba", m_lo, lo_oh) + jnp.einsum("bn,bna->ba", m_up, up_oh)
    return m


class C51Trainer:
    def __init__(
        self,
        q_network: CategoricalDQN,
        rl: RLParameters = RLParameters(),
        double_q_learning: bool = True,
        optimizer: Any = None,
        action_names: Optional[Tuple[str, ...]] = None,
    ) -> None:
        self.q_network = q_network
        self.rl = rl
        self.gamma = rl.gamma
        self.tau = rl.target_update_rate
        self.double_q_learning = double_q_learning
        self.maxq_learning = rl.maxq_learning
        self.optimizer = make_optimizer(optimizer)
        self.reward_boosts = reward_boost_array(rl.reward_boost, action_names)
        self.qmin = q_network.qmin
        self.qmax = q_network.qmax
        self.num_atoms = q_network.num_atoms

    def init(self, rng: Array, obs_proto: Array) -> C51TrainerState:
        q_params = self.q_network.init(rng, obs_proto, method="log_dist")
        return C51TrainerState(
            q_params=q_params,
            q_target_params=jax.tree_util.tree_map(jnp.copy, q_params),
            opt_state=self.optimizer.init(q_params),
            step=jnp.zeros((), jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: C51TrainerState, batch: rlt.DiscreteDqnInput
    ) -> Tuple[C51TrainerState, Dict[str, Array]]:
        support = self.q_network.support
        rewards = boost_rewards(batch.reward, batch.action, self.reward_boosts)
        discount = compute_discount_tensor(
            batch, self.gamma, self.rl.use_seq_num_diff_as_time_diff, self.rl.multi_steps
        )
        not_terminal = batch.not_terminal.astype(jnp.float32)
        next_obs = batch.next_state.float_features

        next_dist_all = jnp.exp(
            self.q_network.apply(state.q_target_params, next_obs, method="log_dist")
        )  # [B, A, N]
        if self.maxq_learning:
            if self.double_q_learning:
                next_q = jnp.sum(
                    jnp.exp(self.q_network.apply(state.q_params, next_obs, method="log_dist"))
                    * support,
                    axis=2,
                )
            else:
                next_q = jnp.sum(next_dist_all * support, axis=2)
            mask = batch.possible_next_actions_mask.astype(jnp.float32)
            next_q = next_q + ACTION_NOT_POSSIBLE_VAL * (1.0 - mask)
            next_action = jnp.argmax(next_q, axis=1)
            next_dist = jnp.take_along_axis(
                next_dist_all, next_action[:, None, None], axis=1
            )[:, 0]
        else:
            next_dist = jnp.sum(
                next_dist_all * batch.next_action[:, :, None], axis=1
            )

        # Bellman support update; terminal rows collapse to the reward atom.
        target_q = rewards + discount * not_terminal * support[None, :]
        m = categorical_projection(next_dist, target_q, self.qmin, self.qmax, self.num_atoms)
        m = jax.lax.stop_gradient(m)

        def loss_fn(params):
            log_dist = self.q_network.apply(
                params, batch.state.float_features, method="log_dist"
            )
            all_q = jnp.sum(jnp.exp(log_dist) * support, axis=2)
            log_dist_taken = jnp.sum(log_dist * batch.action[:, :, None], axis=1)
            loss = -jnp.mean(jnp.sum(m * log_dist_taken, axis=1))
            return loss, all_q

        (loss, all_q), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.q_params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.q_params)
        q_params = optax.apply_updates(state.q_params, updates)

        new_state = C51TrainerState(
            q_params=q_params,
            q_target_params=soft_update(q_params, state.q_target_params, self.tau),
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {
            "td_loss": loss,
            "q_values_mean": jnp.mean(all_q),
            "reward_mean": jnp.mean(rewards),
        }

    def q_values(self, state: C51TrainerState, obs: Array) -> Array:
        return self.q_network.apply(state.q_params, obs)
