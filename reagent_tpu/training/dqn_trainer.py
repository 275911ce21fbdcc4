"""DQN trainer (double-Q, SARSA mode, BCQ, reward boosting).

Reference: reagent/training/dqn_trainer.py:28-120 + dqn_trainer_base.py.

TPU-native design: one jitted pure ``train_step(state, batch)`` computing the
TD loss, its gradient, the optimizer update, and the target-network polyak
blend in a single XLA program.  The reference's generator-per-optimizer
protocol (reagent_lightning_module.py:109-134) dissolves into explicit
per-network ``jax.grad`` calls inside the step.
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
from reagent_tpu.models.bcq import bcq_mask_q_values
from reagent_tpu.optim import make_optimizer, soft_update
from reagent_tpu.training.rl_trainer_base import (
    boost_rewards,
    compute_discount_tensor,
    get_max_q_values_with_target,
    q_network_loss_fn,
    reward_boost_array,
)

Array = jax.Array


@struct.dataclass
class DQNTrainerState:
    q_params: Any
    q_target_params: Any
    opt_state: Any
    step: Array
    # Optional CPE heads (None when calc_cpe_in_training=False)
    reward_params: Any = None
    reward_opt_state: Any = None
    cpe_params: Any = None
    cpe_target_params: Any = None
    cpe_opt_state: Any = None


class DQNTrainer:
    """Discrete-action DQN with double-Q, optional BCQ and CPE heads."""

    def __init__(
        self,
        q_network: nn.Module,
        rl: RLParameters = RLParameters(),
        double_q_learning: bool = True,
        bcq_drop_threshold: Optional[float] = None,  # not None => BCQ
        bcq_imitator: Optional[nn.Module] = None,
        optimizer: Any = None,
        action_names: Optional[Tuple[str, ...]] = None,
        reward_network: Optional[nn.Module] = None,
        q_network_cpe: Optional[nn.Module] = None,
        metrics_to_score: Optional[Tuple[str, ...]] = None,
        emit_reporter_arrays: bool = False,
    ) -> None:
        # per-sample reporter arrays cost HBM/bandwidth inside scanned epochs;
        # model managers turn this on for reported workflow runs
        self.emit_reporter_arrays = emit_reporter_arrays
        self.q_network = q_network
        self.rl = rl
        self.gamma = rl.gamma
        self.tau = rl.target_update_rate
        self.double_q_learning = double_q_learning
        self.maxq_learning = rl.maxq_learning
        self.multi_steps = rl.multi_steps
        self.bcq = bcq_drop_threshold is not None
        self.bcq_drop_threshold = bcq_drop_threshold or 0.0
        self.bcq_imitator = bcq_imitator
        self.optimizer = make_optimizer(optimizer)
        self.loss_fn = q_network_loss_fn(rl.q_network_loss)
        self.action_names = action_names
        self.reward_boosts = reward_boost_array(rl.reward_boost, action_names)
        # CPE heads (reference dqn_trainer_base.py:244 _initialize_cpe)
        self.calc_cpe_in_training = reward_network is not None
        self.reward_network = reward_network
        self.q_network_cpe = q_network_cpe
        self.metrics_to_score = metrics_to_score or ()

    # ------------------------------------------------------------------ init

    def init(self, rng: Array, obs_prototype: Array) -> DQNTrainerState:
        q_params = self.q_network.init(rng, obs_prototype)
        state = DQNTrainerState(
            q_params=q_params,
            q_target_params=jax.tree_util.tree_map(jnp.copy, q_params),
            opt_state=self.optimizer.init(q_params),
            step=jnp.zeros((), jnp.int32),
        )
        if self.calc_cpe_in_training:
            r1, r2 = jax.random.split(jax.random.fold_in(rng, 1))
            reward_params = self.reward_network.init(r1, obs_prototype)
            cpe_params = self.q_network_cpe.init(r2, obs_prototype)
            state = state.replace(
                reward_params=reward_params,
                reward_opt_state=self.optimizer.init(reward_params),
                cpe_params=cpe_params,
                cpe_target_params=jax.tree_util.tree_map(jnp.copy, cpe_params),
                cpe_opt_state=self.optimizer.init(cpe_params),
            )
        return state

    # ------------------------------------------------------------- td target

    def _td_target(self, state: DQNTrainerState, batch: rlt.DiscreteDqnInput):
        rewards = boost_rewards(batch.reward, batch.action, self.reward_boosts)
        discount = compute_discount_tensor(
            batch, self.gamma, self.rl.use_seq_num_diff_as_time_diff, self.multi_steps
        )
        not_done = batch.not_terminal.astype(jnp.float32)
        next_obs = batch.next_state.float_features
        next_q = self.q_network.apply(state.q_params, next_obs)
        next_q_target = self.q_network.apply(state.q_target_params, next_obs)
        if self.maxq_learning:
            mask = batch.possible_next_actions_mask.astype(jnp.float32)
            if self.bcq:
                imitator_logits = self.bcq_imitator.apply(state.q_params, next_obs)
                masked = bcq_mask_q_values(
                    jnp.zeros_like(imitator_logits), imitator_logits, self.bcq_drop_threshold
                )
                mask = mask * (masked > -1e30).astype(jnp.float32)
            next_q_sel, _ = get_max_q_values_with_target(
                next_q, next_q_target, mask, self.double_q_learning
            )
        else:  # SARSA — evaluate logged next action
            next_q_sel, _ = get_max_q_values_with_target(
                next_q, next_q_target, batch.next_action, self.double_q_learning
            )
        target_q = rewards + discount * next_q_sel * not_done
        return jax.lax.stop_gradient(target_q), rewards

    # ------------------------------------------------------------ train step

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: DQNTrainerState, batch: rlt.DiscreteDqnInput
    ) -> Tuple[DQNTrainerState, Dict[str, Array]]:
        target_q, rewards = self._td_target(state, batch)

        def td_loss_fn(q_params):
            all_q = self.q_network.apply(q_params, batch.state.float_features)
            q_taken = jnp.sum(all_q * batch.action, axis=1, keepdims=True)
            return self.loss_fn(q_taken, target_q), (all_q, q_taken)

        (td_loss, (all_q, q_taken)), grads = jax.value_and_grad(
            td_loss_fn, has_aux=True
        )(state.q_params)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.q_params
        )
        q_params = optax.apply_updates(state.q_params, updates)
        q_target_params = soft_update(q_params, state.q_target_params, self.tau)

        metrics = {
            "td_loss": td_loss,
            "q_values_mean": jnp.mean(all_q),
            "q_taken_mean": jnp.mean(q_taken),
            "reward_mean": jnp.mean(rewards),
        }
        if self.emit_reporter_arrays:
            # per-sample arrays for the reporter's action histograms / recent
            # windows (reference dqn_trainer.py:311-320 reporter.log keys)
            masked_q = jnp.where(batch.possible_actions_mask > 0, all_q, -jnp.inf)
            metrics.update(
                logged_actions=jnp.argmax(batch.action, axis=1),
                logged_rewards=rewards.reshape(-1),
                model_values=all_q,
                model_action_idxs=jnp.argmax(masked_q, axis=1),
            )
        new_state = state.replace(
            q_params=q_params,
            q_target_params=q_target_params,
            opt_state=opt_state,
            step=state.step + 1,
        )

        if self.calc_cpe_in_training:
            new_state, cpe_metrics = self._cpe_step(new_state, batch, rewards)
            metrics.update(cpe_metrics)
        return new_state, metrics

    # ----------------------------------------------------------- CPE heads

    def _cpe_step(self, state: DQNTrainerState, batch, rewards):
        """Train reward + CPE Q heads (reference dqn_trainer_base.py:333-454)."""
        obs = batch.state.float_features

        def reward_loss_fn(params):
            pred = self.reward_network.apply(params, obs)
            pred_taken = jnp.sum(pred * batch.action, axis=1, keepdims=True)
            return jnp.mean((pred_taken - rewards) ** 2)

        r_loss, r_grads = jax.value_and_grad(reward_loss_fn)(state.reward_params)
        r_updates, r_opt = self.optimizer.update(
            r_grads, state.reward_opt_state, state.reward_params
        )
        reward_params = optax.apply_updates(state.reward_params, r_updates)

        # CPE Q head: TD toward logged metric (reward) under evaluated policy.
        discount = compute_discount_tensor(
            batch, self.gamma, self.rl.use_seq_num_diff_as_time_diff, self.multi_steps
        )
        not_done = batch.not_terminal.astype(jnp.float32)
        next_obs = batch.next_state.float_features
        next_q_cpe = self.q_network_cpe.apply(state.cpe_params, next_obs)
        next_q_cpe_t = self.q_network_cpe.apply(state.cpe_target_params, next_obs)
        mask = batch.possible_next_actions_mask.astype(jnp.float32)
        next_sel, _ = get_max_q_values_with_target(
            next_q_cpe, next_q_cpe_t, mask, self.double_q_learning
        )
        cpe_target = jax.lax.stop_gradient(rewards + discount * next_sel * not_done)

        def cpe_loss_fn(params):
            q = self.q_network_cpe.apply(params, obs)
            q_taken = jnp.sum(q * batch.action, axis=1, keepdims=True)
            return jnp.mean((q_taken - cpe_target) ** 2)

        c_loss, c_grads = jax.value_and_grad(cpe_loss_fn)(state.cpe_params)
        c_updates, c_opt = self.optimizer.update(
            c_grads, state.cpe_opt_state, state.cpe_params
        )
        cpe_params = optax.apply_updates(state.cpe_params, c_updates)
        cpe_target_params = soft_update(cpe_params, state.cpe_target_params, self.tau)

        return (
            state.replace(
                reward_params=reward_params,
                reward_opt_state=r_opt,
                cpe_params=cpe_params,
                cpe_target_params=cpe_target_params,
                cpe_opt_state=c_opt,
            ),
            {"reward_loss": r_loss, "cpe_td_loss": c_loss},
        )

    # ------------------------------------------------------------- inference

    def q_values(self, state: DQNTrainerState, obs: Array) -> Array:
        return self.q_network.apply(state.q_params, obs)
