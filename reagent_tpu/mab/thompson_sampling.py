"""Thompson-sampling bandits.

Reference: reagent/mab/thompson_sampling.py:13-130 (BernoulliBetaThompson,
NormalGammaThompson).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from reagent_tpu.mab.mab_algorithm import MABAlgo, MABState

Array = jax.Array


class BaseThompsonSampling(MABAlgo):
    def _posterior_samples(self, state: MABState, rng: Array) -> Array:
        raise NotImplementedError

    def get_scores(self, state: MABState, rng: Optional[Array] = None) -> Array:
        assert rng is not None, "Thompson sampling needs an rng"
        return self._posterior_samples(state, rng)


class BernoulliBetaThompson(BaseThompsonSampling):
    """Beta(1 + successes, 1 + failures) posterior (reference :22-35)."""

    def _posterior_samples(self, state: MABState, rng: Array) -> Array:
        alpha = 1.0 + state.total_sum_reward_per_arm
        beta = 1.0 + state.total_n_obs_per_arm - state.total_sum_reward_per_arm
        return jax.random.beta(rng, alpha, beta)


class NormalGammaThompson(BaseThompsonSampling):
    """Normal-Gamma conjugate posterior for gaussian rewards (reference :38-130)."""

    def __init__(self, n_arms=None, arm_ids=None):
        super().__init__(n_arms=n_arms, arm_ids=arm_ids)
        self.lambda_0 = 1.0  # pseudo-observations for the prior mean

    def init_extra(self) -> Dict[str, Array]:
        K = self.n_arms
        return {
            "mus": jnp.zeros(K),
            "alpha_0": jnp.full(K, 1.5),  # shape
            "betas": jnp.full(K, 0.5),  # rate
            "lambdas": jnp.full(K, self.lambda_0),
        }

    def add_batch_observations(
        self, state: MABState, n_obs_per_arm, sum_reward_per_arm, sum_reward_squared_per_arm
    ) -> MABState:
        n = n_obs_per_arm
        mean_rewards = jnp.where(n > 0, sum_reward_per_arm / jnp.maximum(n, 1e-12), 0.0)
        extra = state.extra
        lambdas, mus = extra["lambdas"], extra["mus"]
        new_mus = jnp.where(
            n > 0, (lambdas * mus + n * mean_rewards) / (lambdas + n), mus
        )
        # standard Normal-Gamma update
        ssq = sum_reward_squared_per_arm - n * mean_rewards**2
        new_betas = extra["betas"] + 0.5 * ssq + (
            lambdas * n * (mean_rewards - mus) ** 2
        ) / (2.0 * (lambdas + n))
        new_extra = {
            "mus": new_mus,
            "alpha_0": extra["alpha_0"] + 0.5 * n,
            "betas": new_betas,
            "lambdas": lambdas + n,
        }
        state = super().add_batch_observations(
            state, n_obs_per_arm, sum_reward_per_arm, sum_reward_squared_per_arm
        )
        return state.replace(extra=new_extra)

    def _posterior_samples(self, state: MABState, rng: Array) -> Array:
        r1, r2 = jax.random.split(rng)
        extra = state.extra
        precisions = extra["lambdas"] * jax.random.gamma(r1, extra["alpha_0"]) / extra["betas"]
        return extra["mus"] + jax.random.normal(r2, (self.n_arms,)) / jnp.sqrt(
            jnp.maximum(precisions, 1e-12)
        )
