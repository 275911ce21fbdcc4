"""Random policies for collecting offline data.

Reference: reagent/gym/policies/random_policies.py:18-170 — discrete,
continuous (uniform in the training action range), and multi-discrete random
actors, plus make_random_policy_for_env dispatch.

Pure JAX: act(rng, obs) so the policy runs inside jit/vmap/scan.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import CONTINUOUS_TRAINING_ACTION_RANGE
from reagent_tpu.gym.policies.scorers import apply_possible_actions_mask

Array = jax.Array


def make_random_policy_for_env(env):
    """Dispatch on the (functional or gymnasium) env's action space (ref :18-28)."""
    if getattr(env, "discrete", None) is not None:
        if env.discrete:
            return DiscreteRandomPolicy(num_actions=env.action_dim)
        return ContinuousRandomPolicy(action_dim=env.action_dim)
    import gymnasium

    space = env.action_space
    if isinstance(space, gymnasium.spaces.Discrete):
        return DiscreteRandomPolicy(num_actions=int(space.n))
    if isinstance(space, gymnasium.spaces.Box):
        return ContinuousRandomPolicy(
            action_dim=int(space.shape[0]),
            low=float(space.low.min()),
            high=float(space.high.max()),
        )
    if isinstance(space, gymnasium.spaces.MultiDiscrete):
        return MultiDiscreteRandomPolicy(nvec=[int(n) for n in space.nvec])
    raise NotImplementedError(f"{space} not supported")


class DiscreteRandomPolicy:
    def __init__(self, num_actions: int) -> None:
        self.num_actions = num_actions

    def act(
        self, rng: Array, obs: Array, possible_actions_mask: Optional[Array] = None
    ) -> rlt.ActorOutput:
        B = obs.shape[0] if obs.ndim >= 2 else 1
        scores = jnp.ones((B, self.num_actions))
        scores = apply_possible_actions_mask(
            scores, possible_actions_mask, invalid_score=0.0
        )
        total = jnp.sum(scores, axis=1, keepdims=True)
        # degenerate all-masked rows fall back to uniform instead of NaN
        probs = jnp.where(
            total > 0, scores / jnp.maximum(total, 1.0), 1.0 / self.num_actions
        )
        idx = jax.random.categorical(rng, jnp.log(jnp.maximum(probs, 1e-20)), axis=1)
        action = jax.nn.one_hot(idx, self.num_actions)
        log_prob = jnp.log(jnp.take_along_axis(probs, idx[:, None], axis=1))
        return rlt.ActorOutput(action=action, log_prob=log_prob)


class ContinuousRandomPolicy:
    def __init__(
        self,
        action_dim: int,
        low: float = CONTINUOUS_TRAINING_ACTION_RANGE[0],
        high: float = CONTINUOUS_TRAINING_ACTION_RANGE[1],
    ) -> None:
        self.action_dim = action_dim
        self.low = low
        self.high = high

    def act(self, rng: Array, obs: Array) -> rlt.ActorOutput:
        B = obs.shape[0] if obs.ndim >= 2 else 1
        action = jax.random.uniform(
            rng, (B, self.action_dim), minval=self.low, maxval=self.high
        )
        log_prob = jnp.full(
            (B, 1), -self.action_dim * jnp.log(self.high - self.low)
        )
        return rlt.ActorOutput(action=action, log_prob=log_prob)


class MultiDiscreteRandomPolicy:
    def __init__(self, nvec: List[int]) -> None:
        self.nvec = nvec

    def act(self, rng: Array, obs: Array) -> rlt.ActorOutput:
        B = obs.shape[0] if obs.ndim >= 2 else 1
        keys = jax.random.split(rng, len(self.nvec))
        parts = [
            jax.random.randint(k, (B, 1), 0, n) for k, n in zip(keys, self.nvec)
        ]
        action = jnp.concatenate(parts, axis=1)
        log_prob = jnp.full((B, 1), -sum(jnp.log(float(n)) for n in self.nvec))
        return rlt.ActorOutput(action=action, log_prob=log_prob)
