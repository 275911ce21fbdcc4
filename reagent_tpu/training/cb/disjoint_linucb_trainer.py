"""Disjoint LinUCB trainer — one regression per arm.

Reference: reagent/training/cb/disjoint_linucb_trainer.py:19.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt
from reagent_tpu.models.linear_regression import (
    DisjointLinearRegressionUCB,
    DisjointLinUCBState,
)

Array = jax.Array


class DisjointLinUCBTrainer:
    def __init__(self, scorer: DisjointLinearRegressionUCB):
        self.scorer = scorer

    def init(self) -> DisjointLinUCBState:
        return self.scorer.init()

    def train_step(
        self, state: DisjointLinUCBState, batch: rlt.CBInput
    ) -> Tuple[DisjointLinUCBState, Dict[str, Array]]:
        assert batch.action is not None and batch.reward is not None
        # context features shared across arms: use the chosen arm's features
        row = jnp.arange(batch.context_arm_features.shape[0])
        x = batch.context_arm_features[row, batch.action.reshape(-1)]
        state = self.scorer.update(
            state, batch.action.reshape(-1), x, batch.reward
        )
        return state, {"num_obs": state.num_obs}

    def on_epoch_end(self, state: DisjointLinUCBState) -> DisjointLinUCBState:
        return self.scorer.calculate_coefs(state)
