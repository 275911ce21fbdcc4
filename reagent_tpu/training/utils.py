"""Shared training utilities.

Reference: reagent/training/utils.py (whiten, discounted_returns, rescale_actions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def whiten(x: jnp.ndarray, subtract_mean: bool) -> jnp.ndarray:
    numer = x
    if subtract_mean:
        numer = numer - jnp.mean(x)
    return numer / (jnp.std(x, ddof=1) + EPS)


def discounted_returns(rewards: jnp.ndarray, gamma: float = 0.0) -> jnp.ndarray:
    """Reward-to-go along axis 0 via reverse scan (reference utils.py:40-51)."""
    if gamma == 0:
        return rewards.astype(jnp.float32)

    def body(carry, r):
        carry = r + gamma * carry
        return carry, carry

    _, returns = jax.lax.scan(
        body, jnp.zeros_like(rewards[0]), rewards, reverse=True
    )
    return returns.astype(jnp.float32)


def masked_whiten(x: jnp.ndarray, mask: jnp.ndarray, subtract_mean: bool) -> jnp.ndarray:
    """Whiten using statistics over valid steps only (padded-episode variant)."""
    n = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(x * mask) / n
    var = jnp.sum(((x - mean) * mask) ** 2) / jnp.maximum(n - 1.0, 1.0)
    numer = x - mean if subtract_mean else x
    return numer / (jnp.sqrt(var) + EPS)


def rescale_actions(
    actions: jnp.ndarray,
    new_min: jnp.ndarray,
    new_max: jnp.ndarray,
    prev_min: jnp.ndarray,
    prev_max: jnp.ndarray,
) -> jnp.ndarray:
    """Map actions from [prev_min, prev_max] to [new_min, new_max] (ref utils.py:55)."""
    prev_range = prev_max - prev_min
    new_range = new_max - new_min
    return ((actions - prev_min) / prev_range) * new_range + new_min
