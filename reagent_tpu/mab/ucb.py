"""UCB bandit algorithms.

Reference: reagent/mab/ucb.py:15-141 (UCB1, MetricUCB, UCBTuned).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from reagent_tpu.mab.mab_algorithm import MABAlgo, MABState

Array = jax.Array


class BaseUCB(MABAlgo):
    def __init__(
        self,
        n_arms: Optional[int] = None,
        arm_ids: Optional[Sequence[str]] = None,
        alpha: float = 1.0,
        min_num_obs_per_arm: int = 1,
        estimate_variance: bool = True,
    ):
        super().__init__(n_arms=n_arms, arm_ids=arm_ids)
        self.alpha = alpha
        self.min_num_obs_per_arm = min_num_obs_per_arm
        self.estimate_variance = estimate_variance

    def var(self, state: MABState) -> Array:
        """Per-arm reward variance estimate (reference ucb.py:48-56)."""
        if not self.estimate_variance:
            return jnp.ones(self.n_arms)
        avg = self.get_avg_reward_values(state)
        n = jnp.maximum(state.total_n_obs_per_arm, 1e-12)
        return state.total_sum_reward_squared_per_arm / n - avg**2


class UCB1(BaseUCB):
    """UCB_i = avg_i + alpha * sqrt(2 ln(T+1) / n_i * var) (reference ucb.py:60-80)."""

    def get_scores(self, state: MABState, rng: Optional[Array] = None) -> Array:
        avg = self.get_avg_reward_values(state)
        log_t_over_ni = jnp.log(state.total_n_obs_all_arms + 1) / jnp.maximum(
            state.total_n_obs_per_arm, 1e-12
        )
        scores = avg + self.alpha * jnp.sqrt(2 * log_t_over_ni * self.var(state))
        return jnp.where(state.total_n_obs_per_arm > 0, scores, jnp.inf)


class MetricUCB(BaseUCB):
    """UCB_i = avg + alpha * (sqrt(avg * ln(T+1)/n) + ln(T+1)/n) (ref ucb.py:83-105, arXiv:0809.4882)."""

    def get_scores(self, state: MABState, rng: Optional[Array] = None) -> Array:
        avg = self.get_avg_reward_values(state)
        log_t_over_ni = jnp.log(state.total_n_obs_all_arms + 1) / jnp.maximum(
            state.total_n_obs_per_arm, 1e-12
        )
        scores = avg + self.alpha * (jnp.sqrt(avg * log_t_over_ni) + log_t_over_ni)
        return jnp.where(state.total_n_obs_per_arm > 0, scores, jnp.inf)


class UCBTuned(BaseUCB):
    """UCB-Tuned (Auer et al. 2002, section 4): variance-aware radius."""

    def get_scores(self, state: MABState, rng: Optional[Array] = None) -> Array:
        avg = self.get_avg_reward_values(state)
        n = jnp.maximum(state.total_n_obs_per_arm, 1e-12)
        log_t_over_ni = jnp.log(state.total_n_obs_all_arms + 1) / n
        per_arm_var_est = (
            self.var(state) + jnp.sqrt(2 * log_t_over_ni)
        )  # variance UCB
        scores = avg + self.alpha * jnp.sqrt(
            log_t_over_ni * jnp.minimum(0.25, per_arm_var_est)
        )
        return jnp.where(state.total_n_obs_per_arm > 0, scores, jnp.inf)
