"""Discrete CRR (Critic-Regularized Regression) trainer.

Reference: reagent/training/discrete_crr_trainer.py:32-390 (arXiv:2006.15134):
critic TD toward pi-averaged next value; actor is advantage-weighted behavior
cloning with exp(A/beta) weights clamped to max_weight.
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

Array = jax.Array


@struct.dataclass
class CRRTrainerState:
    actor_params: Any
    actor_target_params: Any
    q1_params: Any
    q1_target_params: Any
    actor_opt_state: Any
    q1_opt_state: Any
    step: Array
    q2_params: Any = None
    q2_target_params: Any = None
    q2_opt_state: Any = None


class DiscreteCRRTrainer:
    def __init__(
        self,
        actor_network: nn.Module,  # state -> action logits [B, A]
        q1_network: nn.Module,  # state -> q values [B, A]
        q2_network: Optional[nn.Module] = None,
        rl: RLParameters = RLParameters(gamma=0.9, target_update_rate=0.005),
        q_network_optimizer: Any = None,
        actor_network_optimizer: Any = None,
        use_target_actor: bool = False,
        beta: float = 1.0,
        max_weight: float = 20.0,
        entropy_coeff: float = 0.0,
        clip_limit: float = 10.0,
        emit_reporter_arrays: bool = False,
        delayed_policy_update: int = 1,
    ) -> None:
        self.emit_reporter_arrays = emit_reporter_arrays
        self.actor_network = actor_network
        self.q1_network = q1_network
        self.q2_network = q2_network
        self.rl = rl
        self.gamma = rl.gamma
        self.tau = rl.target_update_rate
        self.q_opt = make_optimizer(q_network_optimizer)
        self.actor_opt = make_optimizer(actor_network_optimizer)
        self.use_target_actor = use_target_actor
        self.beta = beta
        self.max_weight = max_weight
        self.entropy_coeff = entropy_coeff
        self.clip_limit = clip_limit
        self.delayed_policy_update = delayed_policy_update

    def init(self, rng: Array, obs_proto: Array) -> CRRTrainerState:
        r_a, r_q1, r_q2 = jax.random.split(rng, 3)
        actor_params = self.actor_network.init(r_a, obs_proto)
        q1_params = self.q1_network.init(r_q1, obs_proto)
        state = CRRTrainerState(
            actor_params=actor_params,
            actor_target_params=jax.tree_util.tree_map(jnp.copy, actor_params),
            q1_params=q1_params,
            q1_target_params=jax.tree_util.tree_map(jnp.copy, q1_params),
            actor_opt_state=self.actor_opt.init(actor_params),
            q1_opt_state=self.q_opt.init(q1_params),
            step=jnp.zeros((), jnp.int32),
        )
        if self.q2_network is not None:
            q2_params = self.q2_network.init(r_q2, obs_proto)
            state = state.replace(
                q2_params=q2_params,
                q2_target_params=jax.tree_util.tree_map(jnp.copy, q2_params),
                q2_opt_state=self.q_opt.init(q2_params),
            )
        return state

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: CRRTrainerState, batch: rlt.DiscreteDqnInput
    ) -> Tuple[CRRTrainerState, Dict[str, Array]]:
        obs = batch.state.float_features
        next_obs = batch.next_state.float_features
        rewards = batch.reward
        not_terminal = batch.not_terminal.astype(jnp.float32)

        # target V = E_pi[Q_target] (ref :199-213)
        actor_src = (
            state.actor_target_params if self.use_target_actor else state.actor_params
        )
        next_logits = self.actor_network.apply(actor_src, next_obs)
        next_probs = jax.nn.softmax(next_logits, axis=1)
        next_q1 = self.q1_network.apply(state.q1_target_params, next_obs)
        next_v = jnp.sum(next_q1 * next_probs, axis=1, keepdims=True)
        if self.q2_network is not None:
            next_q2 = self.q2_network.apply(state.q2_target_params, next_obs)
            next_v = jnp.minimum(next_v, jnp.sum(next_q2 * next_probs, axis=1, keepdims=True))
        target_q = jax.lax.stop_gradient(rewards + self.gamma * next_v * not_terminal)

        def td_loss_fn(params, net):
            all_q = net.apply(params, obs)
            q_taken = jnp.sum(all_q * batch.action, axis=1, keepdims=True)
            return jnp.mean((q_taken - target_q) ** 2), all_q

        (q1_loss, all_q1), g1 = jax.value_and_grad(td_loss_fn, has_aux=True)(
            state.q1_params, self.q1_network
        )
        u1, q1_opt_state = self.q_opt.update(g1, state.q1_opt_state, state.q1_params)
        q1_params = optax.apply_updates(state.q1_params, u1)

        q2_params, q2_opt_state, q2_loss = state.q2_params, state.q2_opt_state, jnp.asarray(0.0)
        if self.q2_network is not None:
            (q2_loss, _), g2 = jax.value_and_grad(td_loss_fn, has_aux=True)(
                state.q2_params, self.q2_network
            )
            u2, q2_opt_state = self.q_opt.update(g2, state.q2_opt_state, state.q2_params)
            q2_params = optax.apply_updates(state.q2_params, u2)

        # actor: advantage-weighted behavior cloning (ref :221-289), branchless
        # delayed update (cond-in-scan is pathological on TPU)
        all_q_values = jax.lax.stop_gradient(all_q1)

        def actor_loss_fn(a_params):
            logits = self.actor_network.apply(a_params, obs)
            log_probs = jax.nn.log_softmax(logits, axis=1)
            probs = jnp.exp(log_probs)
            values = jnp.sum(all_q_values * probs, axis=1, keepdims=True)
            advantages = all_q_values - values
            weight = jnp.clip(
                jnp.exp(
                    (1.0 / self.beta)
                    * jnp.sum(advantages * batch.action, axis=1, keepdims=True)
                ),
                0.0,
                self.max_weight,
            )
            log_pi_b = jnp.sum(log_probs * batch.action, axis=1, keepdims=True)
            loss = jnp.mean(-log_pi_b * jax.lax.stop_gradient(weight))
            if self.entropy_coeff > 0:
                pi_t = jnp.sum(probs * batch.action, axis=1, keepdims=True)
                pi_b = batch.extras.action_probability
                pi_ratio = jnp.clip(pi_t / pi_b, 1e-4, self.clip_limit)
                loss = loss + self.entropy_coeff * jnp.mean(pi_ratio * log_pi_b)
            return loss

        flag = state.step % self.delayed_policy_update == 0
        blend = lambda n, o: jax.tree_util.tree_map(
            lambda a, b: jnp.where(flag, a, b), n, o
        )
        actor_loss_raw, a_grads = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        a_up, new_a_opt = self.actor_opt.update(
            a_grads, state.actor_opt_state, state.actor_params
        )
        actor_params = blend(
            optax.apply_updates(state.actor_params, a_up), state.actor_params
        )
        actor_opt_state = blend(new_a_opt, state.actor_opt_state)
        actor_loss = jnp.where(flag, actor_loss_raw, 0.0)

        return (
            state.replace(
                actor_params=actor_params,
                actor_target_params=blend(
                    soft_update(actor_params, state.actor_target_params, self.tau),
                    state.actor_target_params,
                ),
                q1_params=q1_params,
                q1_target_params=soft_update(q1_params, state.q1_target_params, self.tau),
                actor_opt_state=actor_opt_state,
                q1_opt_state=q1_opt_state,
                q2_params=q2_params,
                q2_target_params=(
                    soft_update(q2_params, state.q2_target_params, self.tau)
                    if self.q2_network is not None
                    else state.q2_target_params
                ),
                q2_opt_state=q2_opt_state,
                step=state.step + 1,
            ),
            {
                "q1_loss": q1_loss,
                "q2_loss": q2_loss,
                "actor_loss": actor_loss,
                # reporter action-histogram arrays (reference
                # discrete_crr_reporter.py / dqn_trainer.py:311-320)
                **(
                    dict(
                        logged_actions=jnp.argmax(batch.action, axis=1),
                        logged_rewards=rewards.reshape(-1),
                        model_values=all_q1,
                        model_action_idxs=jnp.argmax(all_q1, axis=1),
                    )
                    if self.emit_reporter_arrays
                    else {}
                ),
            },
        )

    def q_values(self, state: CRRTrainerState, obs: Array) -> Array:
        return self.q1_network.apply(state.q1_params, obs)

    def actor_logits(self, state: CRRTrainerState, obs: Array) -> Array:
        return self.actor_network.apply(state.actor_params, obs)
