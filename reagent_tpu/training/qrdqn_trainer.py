"""QR-DQN (quantile-regression distributional DQN) trainer.

Reference: reagent/training/qrdqn_trainer.py:109-200 — quantile huber loss
between the Bellman-updated target quantiles and the current quantiles.
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
    ACTION_NOT_POSSIBLE_VAL,
    boost_rewards,
    compute_discount_tensor,
    reward_boost_array,
)

Array = jax.Array


@struct.dataclass
class QRDQNTrainerState:
    q_params: Any
    q_target_params: Any
    opt_state: Any
    step: Array


class QRDQNTrainer:
    """Q-network must emit [B, num_actions, num_atoms] quantile values.

    Use ``FullyConnectedDQN`` with action_dim*num_atoms outputs via the
    ``quantile_head`` wrapper below, or ``DuelingQNetwork(num_atoms=N)``.
    """

    def __init__(
        self,
        q_network: nn.Module,
        num_atoms: int,
        rl: RLParameters = RLParameters(),
        double_q_learning: bool = True,
        optimizer: Any = None,
        action_names: Optional[Tuple[str, ...]] = None,
    ) -> None:
        self.q_network = q_network
        self.num_atoms = num_atoms
        self.rl = rl
        self.gamma = rl.gamma
        self.tau = rl.target_update_rate
        self.double_q_learning = double_q_learning
        self.maxq_learning = rl.maxq_learning
        self.optimizer = make_optimizer(optimizer)
        self.reward_boosts = reward_boost_array(rl.reward_boost, action_names)
        # quantile midpoints (ref qrdqn_trainer.py:79-82)
        self.quantiles = (jnp.arange(num_atoms, dtype=jnp.float32) + 0.5) / num_atoms

    def init(self, rng: Array, obs_proto: Array) -> QRDQNTrainerState:
        q_params = self.q_network.init(rng, obs_proto)
        return QRDQNTrainerState(
            q_params=q_params,
            q_target_params=jax.tree_util.tree_map(jnp.copy, q_params),
            opt_state=self.optimizer.init(q_params),
            step=jnp.zeros((), jnp.int32),
        )

    def _qf(self, params, obs) -> Array:
        """[B, A, N] quantile values."""
        out = self.q_network.apply(params, obs)
        if out.ndim == 2:
            out = out.reshape(out.shape[0], -1, self.num_atoms)
        return out

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: QRDQNTrainerState, batch: rlt.DiscreteDqnInput
    ) -> Tuple[QRDQNTrainerState, Dict[str, Array]]:
        rewards = boost_rewards(batch.reward, batch.action, self.reward_boosts)
        discount = compute_discount_tensor(
            batch, self.gamma, self.rl.use_seq_num_diff_as_time_diff, self.rl.multi_steps
        )
        not_done = batch.not_terminal.astype(jnp.float32)
        next_obs = batch.next_state.float_features

        next_qf = self._qf(state.q_target_params, next_obs)  # [B, A, N]
        if self.maxq_learning:
            sel_src = (
                self._qf(state.q_params, next_obs) if self.double_q_learning else next_qf
            )
            next_q = jnp.mean(sel_src, axis=2)
            mask = batch.possible_next_actions_mask.astype(jnp.float32)
            next_q = next_q + ACTION_NOT_POSSIBLE_VAL * (1.0 - mask)
            next_action = jnp.argmax(next_q, axis=1)
            next_qf_sel = jnp.take_along_axis(next_qf, next_action[:, None, None], axis=1)[:, 0]
        else:
            next_qf_sel = jnp.sum(next_qf * batch.next_action[:, :, None], axis=1)

        target_q = jax.lax.stop_gradient(
            rewards + discount * not_done * next_qf_sel
        )  # [B, N]

        def loss_fn(params):
            qf = self._qf(params, batch.state.float_features)  # [B, A, N]
            all_q = jnp.mean(qf, axis=2)
            qf_taken = jnp.sum(qf * batch.action[:, :, None], axis=1)  # [B, N]
            # pairwise TD: theta_j vs target_i -> [B, N_target, N_current]
            td = target_q[:, :, None] - qf_taken[:, None, :]
            abs_td = jnp.abs(td)
            huber = jnp.where(abs_td < 1.0, 0.5 * td**2, abs_td - 0.5)
            weight = jnp.abs(
                self.quantiles[None, None, :] - (jax.lax.stop_gradient(td) < 0)
            )
            loss = jnp.mean(huber * weight)
            return loss, all_q

        (loss, all_q), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.q_params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.q_params)
        q_params = optax.apply_updates(state.q_params, updates)

        new_state = QRDQNTrainerState(
            q_params=q_params,
            q_target_params=soft_update(q_params, state.q_target_params, self.tau),
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {"td_loss": loss, "q_values_mean": jnp.mean(all_q)}

    def q_values(self, state: QRDQNTrainerState, obs: Array) -> Array:
        return jnp.mean(self._qf(state.q_params, obs), axis=2)
