"""Postprocessor: invert action normalization for serving.

Reference: reagent/preprocessing/postprocessor.py:19-90 — maps the actor's
[-1, 1] training-range actions back to the environment's serving range for
CONTINUOUS_ACTION features; identity otherwise.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from reagent_tpu.core.parameters import NormalizationParameters
from reagent_tpu.preprocessing.identify_types import (
    CONTINUOUS_ACTION,
    DISCRETE_ACTION,
    DO_NOT_PREPROCESS,
)
from reagent_tpu.preprocessing.normalization import EPS, get_num_output_features

Array = jax.Array


class Postprocessor:
    def __init__(
        self, normalization_parameters: Dict[int, NormalizationParameters]
    ) -> None:
        self.normalization_parameters = normalization_parameters
        self.num_output_features = get_num_output_features(normalization_parameters)
        feature_types = {p.feature_type for p in normalization_parameters.values()}
        assert len(feature_types) == 1, (
            "All dimensions of actions should have the same preprocessing"
        )
        self.feature_type = next(iter(feature_types))
        assert self.feature_type in {
            DISCRETE_ACTION, CONTINUOUS_ACTION, DO_NOT_PREPROCESS,
        }, f"{self.feature_type} is not an action type"
        if self.feature_type == CONTINUOUS_ACTION:
            sorted_features = sorted(normalization_parameters.keys())
            self.min_serving_value = jnp.asarray(
                [normalization_parameters[f].min_value for f in sorted_features],
                jnp.float32,
            )
            self.scaling_factor = jnp.asarray(
                [
                    (normalization_parameters[f].max_value
                     - normalization_parameters[f].min_value) / (2 * (1 - EPS))
                    for f in sorted_features
                ],
                jnp.float32,
            )
        self.almost_one = 1.0 - EPS
        self._fn = jax.jit(self._forward)

    def _forward(self, input: Array) -> Array:
        if self.feature_type == CONTINUOUS_ACTION:
            return (
                self.almost_one + jnp.clip(input, -self.almost_one, self.almost_one)
            ) * self.scaling_factor + self.min_serving_value
        return input

    def __call__(self, input: Array) -> Array:
        return self._fn(input)
