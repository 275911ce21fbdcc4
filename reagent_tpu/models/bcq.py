"""Batch-constrained Q-learning imitator gating.

Reference: reagent/models/bcq.py — wraps a Q-network and an imitator network;
actions whose imitator probability is below ``bcq_drop_threshold`` (relative
to the argmax) have their Q-values driven to -inf at action-selection time.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class BatchConstrainedDQN(nn.Module):
    """Functional gating: combine externally computed q and imitator logits."""

    drop_threshold: float = 0.1

    def __call__(self, q_values: jnp.ndarray, imitator_logits: jnp.ndarray) -> jnp.ndarray:
        return bcq_mask_q_values(q_values, imitator_logits, self.drop_threshold)


def bcq_mask_q_values(
    q_values: jnp.ndarray, imitator_logits: jnp.ndarray, drop_threshold: float
) -> jnp.ndarray:
    """Mask Q-values of actions the imitator deems unlikely (ref dqn_trainer.py:46-56)."""
    probs = nn.softmax(imitator_logits, axis=1)
    max_prob = jnp.max(probs, axis=1, keepdims=True)
    allowed = probs >= drop_threshold * max_prob
    return jnp.where(allowed, q_values, jnp.asarray(-3.4e38, q_values.dtype))
