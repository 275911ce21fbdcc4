"""Policies backed by exported serving artifacts.

Reference: reagent/gym/policies/predictor_policies.py:138 LoC — wraps the
TorchScript predictor as a gym policy for serving-parity evaluation; here the
artifact is the framework-free export loaded by
DiscreteDqnPredictorWrapper.load.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from reagent_tpu.core import types as rlt
from reagent_tpu.gym.policies.samplers import GreedyActionSampler, SoftmaxActionSampler


class DiscreteDqnPredictorPolicy:
    """Greedy (or softmax) policy over a loaded serving artifact."""

    def __init__(self, model_path: str, temperature: Optional[float] = None):
        from reagent_tpu.prediction.predictor_wrapper import DiscreteDqnPredictorWrapper

        self.predictor = DiscreteDqnPredictorWrapper.load(model_path)
        self.sampler = (
            SoftmaxActionSampler(temperature) if temperature else GreedyActionSampler()
        )

    def act(self, params_unused, obs, rng=None) -> rlt.ActorOutput:
        values = np.asarray(obs, np.float32)
        if values.ndim == 1:
            values = values[None, :]
        presence = np.ones_like(values)
        _, q = self.predictor(values, presence)
        import jax.numpy as jnp

        return self.sampler.sample_action(jnp.asarray(q), rng)


def create_predictor_policy_from_model(model_path: str, **kwargs) -> DiscreteDqnPredictorPolicy:
    """Reference predictor_policies.py create_predictor_policy_from_model."""
    return DiscreteDqnPredictorPolicy(model_path, **kwargs)
