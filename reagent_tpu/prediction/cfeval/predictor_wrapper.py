"""Counterfactual-eval serving wrapper: per-action reward predictions + mask.

Reference: reagent/prediction/cfeval/predictor_wrapper.py:16-44 — wraps a
reward model (DQN-shaped head over actions) and returns (predictions, mask).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from reagent_tpu.prediction.predictor_wrapper import DiscreteDqnWithPreprocessor

Array = jax.Array


class BanditRewardNetPredictorWrapper:
    def __init__(
        self,
        reward_model_with_preprocessor: DiscreteDqnWithPreprocessor,
        action_names: List[str],
    ) -> None:
        self.reward_model_with_preprocessor = reward_model_with_preprocessor
        self.action_names = list(action_names)

    def __call__(self, values: Array, presence: Array) -> Tuple[Array, Array]:
        preds = self.reward_model_with_preprocessor(values, presence)
        B = preds.shape[0]
        A = len(self.action_names)
        assert preds.shape == (B, A), f"Invalid shape {preds.shape} != ({B}, {A})"
        return preds, jnp.ones_like(preds, jnp.uint8)
