"""LinUCB contextual-bandit trainer.

Reference: reagent/training/cb/linucb_trainer.py:19 (arXiv:1003.0146) and
cb/base_trainer.py:23 (offline-eval integration hooks).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt
from reagent_tpu.models.linear_regression import LinearRegressionUCB, LinUCBState

Array = jax.Array


class LinUCBTrainer:
    """Updates the joint LinUCB regression from logged (context, arm, reward)."""

    def __init__(self, scorer: LinearRegressionUCB):
        self.scorer = scorer

    def init(self) -> LinUCBState:
        return self.scorer.init()

    def train_step(
        self, state: LinUCBState, batch: rlt.CBInput
    ) -> Tuple[LinUCBState, Dict[str, Array]]:
        assert batch.action is not None and batch.reward is not None
        # features of the chosen arm: [B, D]
        row = jnp.arange(batch.context_arm_features.shape[0])
        x = batch.context_arm_features[row, batch.action.reshape(-1)]
        weight = batch.weight
        state = self.scorer.update(state, x, batch.reward, weight)
        return state, {"num_obs": state.num_obs}

    def on_epoch_end(self, state: LinUCBState) -> LinUCBState:
        """Solve coefficients + apply discounting (ref linucb_trainer.py:92-99)."""
        state = self.scorer.calculate_coefs(state)
        return self.scorer.apply_discounting(state)

    def score(self, state: LinUCBState, batch: rlt.CBInput, ucb_alpha: Optional[float] = None) -> Array:
        """UCB score per arm: [B, num_arms]."""
        B, K, D = batch.context_arm_features.shape
        flat = batch.context_arm_features.reshape(B * K, D)
        out = self.scorer.forward(state, flat, ucb_alpha)
        return out["ucb"].reshape(B, K)
