"""Policies: Policy = scorer . sampler (reference gym/policies/policy.py:13)."""

from reagent_tpu.gym.policies.policy import Policy
from reagent_tpu.gym.policies.samplers import (
    EpsilonGreedyActionSampler,
    GaussianSampler,
    GreedyActionSampler,
    SoftmaxActionSampler,
    TopKSampler,
)
from reagent_tpu.gym.policies.scorers import (
    discrete_dqn_scorer,
    parametric_dqn_scorer,
    sac_scorer,
    slate_q_scorer,
)
from reagent_tpu.gym.policies.random_policies import (
    ContinuousRandomPolicy,
    DiscreteRandomPolicy,
    MultiDiscreteRandomPolicy,
    make_random_policy_for_env,
)

__all__ = [
    "Policy",
    "SoftmaxActionSampler",
    "GreedyActionSampler",
    "EpsilonGreedyActionSampler",
    "GaussianSampler",
    "TopKSampler",
    "discrete_dqn_scorer",
    "parametric_dqn_scorer",
    "sac_scorer",
    "slate_q_scorer",
    "make_random_policy_for_env",
    "DiscreteRandomPolicy",
    "ContinuousRandomPolicy",
    "MultiDiscreteRandomPolicy",
]
