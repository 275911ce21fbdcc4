"""Action samplers: scores -> sampled action + log-prob.

Reference: reagent/gym/policies/samplers/discrete_sampler.py:14
(SoftmaxActionSampler), epsilon-greedy (:108), continuous_sampler.py
(GaussianSampler), top_k_sampler.py.

Pure functions of (scores, rng); temperature/epsilon are static attributes so
samplers close into jitted rollout loops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt

Array = jax.Array


class SoftmaxActionSampler:
    """Boltzmann exploration over logits (ref discrete_sampler.py:14-70)."""

    def __init__(self, temperature: float = 1.0):
        assert temperature > 0, f"Invalid non-positive temperature {temperature}."
        self.temperature = temperature

    def sample_action(self, scores: Array, rng: Array) -> rlt.ActorOutput:
        logits = scores / self.temperature
        raw_action = jax.random.categorical(rng, logits, axis=-1)  # [B]
        num_actions = scores.shape[-1]
        action = jax.nn.one_hot(raw_action, num_actions)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        log_prob = jnp.take_along_axis(log_probs, raw_action[:, None], axis=1)[:, 0]
        return rlt.ActorOutput(action=action, log_prob=log_prob)

    def log_prob(self, scores: Array, action: Array) -> Array:
        """Log-prob of a one-hot action under the softmax policy."""
        log_probs = jax.nn.log_softmax(scores / self.temperature, axis=-1)
        return jnp.sum(log_probs * action, axis=-1)

    def entropy(self, scores: Array) -> Array:
        log_probs = jax.nn.log_softmax(scores / self.temperature, axis=-1)
        return -jnp.sum(jnp.exp(log_probs) * log_probs, axis=-1)


class GreedyActionSampler:
    """Deterministic argmax (ref discrete_sampler.py:75)."""

    def sample_action(self, scores: Array, rng: Optional[Array] = None) -> rlt.ActorOutput:
        raw_action = jnp.argmax(scores, axis=-1)
        action = jax.nn.one_hot(raw_action, scores.shape[-1])
        return rlt.ActorOutput(action=action, log_prob=jnp.zeros(scores.shape[0]))

    def log_prob(self, scores: Array, action: Array) -> Array:
        greedy = jnp.argmax(scores, axis=-1)
        match = jnp.argmax(action, axis=-1) == greedy
        return jnp.where(match, 0.0, -jnp.inf)


class EpsilonGreedyActionSampler:
    """eps-uniform mixture with greedy (ref discrete_sampler.py:108)."""

    def __init__(self, epsilon: float, epsilon_decay: float = 1.0, minimum_epsilon: float = 0.0):
        self.epsilon = float(epsilon)
        self.epsilon_decay = epsilon_decay
        self.minimum_epsilon = minimum_epsilon

    def sample_action(self, scores: Array, rng: Array, epsilon: Optional[Array] = None) -> rlt.ActorOutput:
        eps = self.epsilon if epsilon is None else epsilon
        B, num_actions = scores.shape
        r_explore, r_choice = jax.random.split(rng)
        greedy = jnp.argmax(scores, axis=-1)
        random_action = jax.random.randint(r_choice, (B,), 0, num_actions)
        explore = jax.random.uniform(r_explore, (B,)) < eps
        raw_action = jnp.where(explore, random_action, greedy)
        action = jax.nn.one_hot(raw_action, num_actions)
        p = (
            eps / num_actions
            + (1.0 - eps) * (raw_action == greedy).astype(jnp.float32)
        )
        return rlt.ActorOutput(action=action, log_prob=jnp.log(p))

    def log_prob(self, scores: Array, action: Array) -> Array:
        num_actions = scores.shape[-1]
        greedy = jax.nn.one_hot(jnp.argmax(scores, axis=-1), num_actions)
        p = self.epsilon / num_actions + (1.0 - self.epsilon) * jnp.sum(
            greedy * action, axis=-1
        )
        return jnp.log(p)


class GaussianSampler:
    """For continuous actors that already emit sampled actions.

    Reference: gym/policies/samplers/continuous_sampler.py — there the sampler
    consumes (loc, scale_log); here actor modules sample internally (they take
    rng), so this sampler is a pass-through that preserves the Policy API.
    """

    def sample_action(self, actor_output: rlt.ActorOutput, rng: Optional[Array] = None) -> rlt.ActorOutput:
        return actor_output

    def log_prob(self, actor_output: rlt.ActorOutput, action: Array) -> Array:
        return actor_output.log_prob


class TopKSampler:
    """Pick the k highest-scoring items (reference top_k_sampler.py:12-23)."""

    def __init__(self, k: int) -> None:
        self.k = k

    def sample_action(self, scores, rng=None) -> rlt.ActorOutput:
        top_values, item_idxs = jax.lax.top_k(scores, self.k)
        return rlt.ActorOutput(
            action=item_idxs, log_prob=jnp.zeros((item_idxs.shape[0], 1))
        )
