"""Soft Actor-Critic trainer.

Reference: reagent/training/sac_trainer.py:51,196-386 — twin critics, optional
value network, entropy-temperature auto-tuning via log-alpha.

TPU-native: one jitted step computes all four losses (q1, q2, actor, alpha)
with independent grads and applies them in sequence; target blends are polyak
averages inside the same XLA program.
"""

from __future__ import annotations

import dataclasses
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
LOG_PROB_MIN = -2.0
LOG_PROB_MAX = 2.0


@dataclasses.dataclass(frozen=True)
class CRRWeightFn:
    """Advantage -> actor-loss weight (reference parameters.py CRRWeightFn;
    sac_trainer.py:269-277 uses it for continuous CRR)."""

    indicator_fn_threshold: Optional[float] = None
    exponent_beta: Optional[float] = None
    exponent_clamp: Optional[float] = None

    def __post_init__(self):
        # `is not None`: a 0.0 indicator threshold (advantage >= 0) is valid
        # (the reference's truthiness check rejects it)
        has_beta = self.exponent_beta is not None
        has_thresh = self.indicator_fn_threshold is not None
        assert has_beta or has_thresh
        assert not (has_beta and has_thresh)

    def get_weight_from_advantage(self, advantage: Array) -> Array:
        if self.exponent_beta is not None:
            w = jnp.exp(advantage / self.exponent_beta)
            if self.exponent_clamp:
                w = jnp.clip(w, 0.0, self.exponent_clamp)
            return w
        return (advantage >= self.indicator_fn_threshold).astype(jnp.float32)


@struct.dataclass
class SACTrainerState:
    actor_params: Any
    q1_params: Any
    q1_target_params: Any
    actor_opt_state: Any
    q1_opt_state: Any
    rng: Array
    step: Array
    q2_params: Any = None
    q2_target_params: Any = None
    q2_opt_state: Any = None
    log_alpha: Optional[Array] = None
    alpha_opt_state: Any = None
    value_params: Any = None
    value_target_params: Any = None
    value_opt_state: Any = None


class SACTrainer:
    def __init__(
        self,
        actor_network: nn.Module,
        q1_network: nn.Module,
        q2_network: Optional[nn.Module] = None,
        value_network: Optional[nn.Module] = None,
        rl: RLParameters = RLParameters(gamma=0.9, target_update_rate=0.005),
        q_network_optimizer: Any = None,
        actor_network_optimizer: Any = None,
        value_network_optimizer: Any = None,
        alpha_optimizer: Any = "default",  # None disables entropy auto-tune
        entropy_temperature: float = 0.2,
        target_entropy: float = -1.0,
        backprop_through_log_prob: bool = True,
        crr_config: Optional[CRRWeightFn] = None,
    ) -> None:
        self.actor_network = actor_network
        self.q1_network = q1_network
        self.q2_network = q2_network
        self.value_network = value_network
        self.rl = rl
        self.gamma = rl.gamma
        self.tau = rl.target_update_rate
        self.q_opt = make_optimizer(q_network_optimizer)
        self.actor_opt = make_optimizer(actor_network_optimizer)
        self.value_opt = make_optimizer(value_network_optimizer)
        self.autotune_alpha = alpha_optimizer is not None
        self.alpha_opt = make_optimizer(
            None if alpha_optimizer == "default" else alpha_optimizer
        )
        self.entropy_temperature = entropy_temperature
        self.target_entropy = target_entropy
        self.backprop_through_log_prob = backprop_through_log_prob
        if isinstance(crr_config, dict):
            crr_config = CRRWeightFn(**crr_config)
        self.crr_config = crr_config
        if crr_config is not None:
            assert value_network is not None, "continuous CRR needs a value net"

    def init(self, rng: Array, obs_proto: Array, action_proto: Array) -> SACTrainerState:
        r_actor, r_q1, r_q2, r_v, r_state = jax.random.split(rng, 5)
        actor_params = self.actor_network.init(r_actor, obs_proto)
        q1_params = self.q1_network.init(r_q1, obs_proto, action_proto)
        state = SACTrainerState(
            actor_params=actor_params,
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
        if self.autotune_alpha:
            log_alpha = jnp.asarray(jnp.log(self.entropy_temperature), jnp.float32)
            state = state.replace(
                log_alpha=log_alpha, alpha_opt_state=self.alpha_opt.init(log_alpha)
            )
        if self.value_network is not None:
            v_params = self.value_network.init(r_v, obs_proto)
            state = state.replace(
                value_params=v_params,
                value_target_params=jax.tree_util.tree_map(jnp.copy, v_params),
                value_opt_state=self.value_opt.init(v_params),
            )
        return state

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: SACTrainerState, batch: rlt.PolicyNetworkInput
    ) -> Tuple[SACTrainerState, Dict[str, Array]]:
        obs = batch.state.float_features
        action = batch.action.float_features
        next_obs = batch.next_state.float_features
        reward = batch.reward
        not_done = batch.not_terminal.astype(jnp.float32)

        rng, r_next, r_actor = jax.random.split(state.rng, 3)
        alpha = (
            jnp.exp(state.log_alpha)
            if state.log_alpha is not None
            else jnp.asarray(self.entropy_temperature)
        )

        # ---- target value (ref sac_trainer.py:215-237)
        if self.value_network is not None:
            next_v = self.value_network.apply(state.value_target_params, next_obs)
        else:
            next_out = self.actor_network.apply(state.actor_params, next_obs, r_next)
            next_v = self.q1_network.apply(
                state.q1_target_params, next_obs, next_out.action
            )
            if self.q2_network is not None:
                next_v = jnp.minimum(
                    next_v,
                    self.q2_network.apply(state.q2_target_params, next_obs, next_out.action),
                )
            log_prob_a = jnp.clip(next_out.log_prob, LOG_PROB_MIN, LOG_PROB_MAX)
            next_v = next_v - alpha * log_prob_a
        target_q = jax.lax.stop_gradient(reward + self.gamma * next_v * not_done)

        # ---- critic updates
        def q_loss_fn(params, net):
            q = net.apply(params, obs, action)
            return jnp.mean((q - target_q) ** 2)

        q1_loss, q1_grads = jax.value_and_grad(q_loss_fn)(state.q1_params, self.q1_network)
        q1_up, q1_opt_state = self.q_opt.update(q1_grads, state.q1_opt_state, state.q1_params)
        q1_params = optax.apply_updates(state.q1_params, q1_up)

        q2_params, q2_opt_state, q2_loss = state.q2_params, state.q2_opt_state, jnp.asarray(0.0)
        if self.q2_network is not None:
            q2_loss, q2_grads = jax.value_and_grad(q_loss_fn)(state.q2_params, self.q2_network)
            q2_up, q2_opt_state = self.q_opt.update(q2_grads, state.q2_opt_state, state.q2_params)
            q2_params = optax.apply_updates(state.q2_params, q2_up)

        # ---- actor update (uses pre-update critic params, ref order)
        def actor_loss_fn(a_params):
            out = self.actor_network.apply(a_params, obs, r_actor)
            q1_pi = self.q1_network.apply(state.q1_params, obs, out.action)
            min_q = q1_pi
            if self.q2_network is not None:
                min_q = jnp.minimum(
                    min_q, self.q2_network.apply(state.q2_params, obs, out.action)
                )
            log_prob = jnp.clip(out.log_prob, LOG_PROB_MIN, LOG_PROB_MAX)
            if not self.backprop_through_log_prob:
                log_prob = jax.lax.stop_gradient(log_prob)
            if self.crr_config is not None:
                # continuous CRR (Wang et al. 2020): advantage-weighted
                # regression toward the LOGGED action, A = Q(s, a_log) - V(s)
                # (ref sac_trainer.py:269-277; the advantage/value machinery
                # is identical, the regression target is the replay action)
                q_logged = self.q1_network.apply(state.q1_params, obs, action)
                if self.q2_network is not None:
                    q_logged = jnp.minimum(
                        q_logged, self.q2_network.apply(state.q2_params, obs, action)
                    )
                cur_value = self.value_network.apply(state.value_params, obs)
                advantage = jax.lax.stop_gradient(q_logged - cur_value)
                crr_weight = self.crr_config.get_weight_from_advantage(advantage)
                logged_lp = self.actor_network.apply(
                    a_params, obs, action, method="get_log_prob"
                )
                loss = -jnp.mean(logged_lp * jax.lax.stop_gradient(crr_weight))
            else:
                loss = jnp.mean(alpha * log_prob - min_q)
            return loss, out

        (actor_loss, actor_out), actor_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True
        )(state.actor_params)
        a_up, actor_opt_state = self.actor_opt.update(
            actor_grads, state.actor_opt_state, state.actor_params
        )
        actor_params = optax.apply_updates(state.actor_params, a_up)

        # ---- alpha update (ref :311-322)
        log_alpha, alpha_opt_state, alpha_loss = (
            state.log_alpha, state.alpha_opt_state, jnp.asarray(0.0)
        )
        if state.log_alpha is not None:
            lp = jax.lax.stop_gradient(
                jnp.clip(actor_out.log_prob, LOG_PROB_MIN, LOG_PROB_MAX)
            )

            def alpha_loss_fn(la):
                return -jnp.mean(la * (lp + self.target_entropy))

            alpha_loss, alpha_grad = jax.value_and_grad(alpha_loss_fn)(state.log_alpha)
            al_up, alpha_opt_state = self.alpha_opt.update(
                alpha_grad, state.alpha_opt_state, state.log_alpha
            )
            log_alpha = optax.apply_updates(state.log_alpha, al_up)

        # ---- value net update (ref :329-352)
        value_params, value_target_params, value_opt_state, value_loss = (
            state.value_params, state.value_target_params, state.value_opt_state,
            jnp.asarray(0.0),
        )
        if self.value_network is not None:
            q1_pi = self.q1_network.apply(q1_params, obs, actor_out.action)
            min_q = q1_pi
            if self.q2_network is not None:
                min_q = jnp.minimum(
                    min_q, self.q2_network.apply(q2_params, obs, actor_out.action)
                )
            lp = jnp.clip(actor_out.log_prob, LOG_PROB_MIN, LOG_PROB_MAX)
            v_target = jax.lax.stop_gradient(min_q - alpha * lp)

            def v_loss_fn(vp):
                v = self.value_network.apply(vp, obs)
                return jnp.mean((v - v_target) ** 2)

            value_loss, v_grads = jax.value_and_grad(v_loss_fn)(state.value_params)
            v_up, value_opt_state = self.value_opt.update(
                v_grads, state.value_opt_state, state.value_params
            )
            value_params = optax.apply_updates(state.value_params, v_up)
            value_target_params = soft_update(value_params, state.value_target_params, self.tau)

        new_state = state.replace(
            actor_params=actor_params,
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
            log_alpha=log_alpha,
            alpha_opt_state=alpha_opt_state,
            value_params=value_params,
            value_target_params=value_target_params,
            value_opt_state=value_opt_state,
            rng=rng,
            step=state.step + 1,
        )
        metrics = {
            "q1_loss": q1_loss,
            "q2_loss": q2_loss,
            "actor_loss": actor_loss,
            "alpha_loss": alpha_loss,
            "value_loss": value_loss,
            "entropy_temperature": alpha,
            "target_q_mean": jnp.mean(target_q),
        }
        return new_state, metrics
