"""MAB trainer: bridge CBInput batches into the MAB algorithm state.

Reference: reagent/training/cb/mab_trainer.py:12-28 — a CB trainer whose
"training step" is the closed-form MAB state update (no optimizer); the
scorer is an arm model from reagent/models/mab.py (here reagent_tpu.mab).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt
from reagent_tpu.mab.mab_algorithm import MABAlgo, MABState

Array = jax.Array


class MABTrainer:
    def __init__(self, scorer: MABAlgo):
        assert isinstance(scorer, MABAlgo)
        self.scorer = scorer

    def init(self) -> MABState:
        return self.scorer.init()

    def train_step(
        self, state: MABState, batch: rlt.CBInput
    ) -> Tuple[MABState, Dict[str, Array]]:
        """Fold the batch's (action, reward, weight) into per-arm sums.

        batch.action: [B, 1] arm indices; batch.reward: [B, 1].
        """
        assert batch.action is not None and batch.reward is not None
        K = self.scorer.n_arms
        actions = batch.action.reshape(-1)
        rewards = batch.reward.reshape(-1)
        weight = (
            batch.weight.reshape(-1)
            if batch.weight is not None
            else jnp.ones_like(rewards)
        )
        onehot = jax.nn.one_hot(actions, K)  # [B, K]
        state = self.scorer.add_batch_observations(
            state,
            n_obs_per_arm=jnp.sum(onehot * weight[:, None], axis=0),
            sum_reward_per_arm=jnp.sum(onehot * (weight * rewards)[:, None], axis=0),
            sum_reward_squared_per_arm=jnp.sum(
                onehot * (weight * rewards**2)[:, None], axis=0
            ),
        )
        return state, {"num_obs": jnp.sum(state.total_n_obs_per_arm)}

    def score(self, state: MABState, rng: Optional[Array] = None) -> Array:
        return self.scorer.get_scores(state, rng)
