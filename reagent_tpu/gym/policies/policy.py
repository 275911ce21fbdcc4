"""Policy = scorer . sampler.

Reference: reagent/gym/policies/policy.py:13-39.  A scorer maps (params, obs)
to scores (Q-values, logits, or an ActorOutput); the sampler turns scores into
an action.  Both are pure, so ``policy.act`` composes into jitted rollouts.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax

from reagent_tpu.core import types as rlt

Array = jax.Array


class Policy:
    def __init__(self, scorer: Callable[[Any, Array], Any], sampler: Any):
        self.scorer = scorer
        self.sampler = sampler

    def act(
        self, params: Any, obs: Array, rng: Optional[Array] = None
    ) -> rlt.ActorOutput:
        scores = self.scorer(params, obs)
        return self.sampler.sample_action(scores, rng)


def discrete_q_scorer(q_network):
    """Scorer from a discrete Q-network module (ref scorers/discrete_scorer.py)."""

    def scorer(params, obs: Array) -> Array:
        return q_network.apply(params, obs)

    return scorer


def actor_scorer(actor_network):
    """Scorer for continuous actors: returns ActorOutput directly.

    The sampler should be a pass-through (GaussianSampler); rng is threaded to
    the actor for reparameterized sampling.
    """

    def scorer(params_and_rng, obs: Array) -> rlt.ActorOutput:
        params, rng = params_and_rng
        return actor_network.apply(params, obs, rng)

    return scorer
