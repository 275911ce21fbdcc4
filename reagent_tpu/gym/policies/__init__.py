"""Policies: Policy = scorer . sampler (reference gym/policies/policy.py:13)."""

from reagent_tpu.gym.policies.policy import Policy
from reagent_tpu.gym.policies.samplers import (
    EpsilonGreedyActionSampler,
    GaussianSampler,
    GreedyActionSampler,
    SoftmaxActionSampler,
)

__all__ = [
    "Policy",
    "SoftmaxActionSampler",
    "GreedyActionSampler",
    "EpsilonGreedyActionSampler",
    "GaussianSampler",
]
