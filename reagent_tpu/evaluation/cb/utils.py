"""CB offline-eval helpers.

Reference: reagent/evaluation/cb/utils.py:9-47 (add_importance_weights).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from reagent_tpu.core.types import CBInput

Array = jax.Array


def add_importance_weights(
    batch: CBInput,
    model_actions: Array,
    max_importance_weight: Optional[float] = None,
) -> CBInput:
    """Zero weight where logged action != model action; 1/p_logged elsewhere.

    Pure and jittable (the reference mutates the dataclass on host).
    """
    logged_actions = batch.action
    assert logged_actions is not None
    assert logged_actions.shape == model_actions.shape, (
        logged_actions.shape,
        model_actions.shape,
    )
    if batch.log_prob is not None:
        logged_action_prob = jnp.exp(batch.log_prob)
    else:
        if batch.arm_presence is not None:
            slate_sizes = jnp.sum(batch.arm_presence, axis=1, keepdims=True)
        else:
            slate_sizes = (
                jnp.ones_like(logged_actions, jnp.float32)
                * batch.context_arm_features.shape[1]
            )
        logged_action_prob = 1.0 / slate_sizes
    importance_weights = 1.0 / logged_action_prob
    if max_importance_weight is not None:
        importance_weights = jnp.minimum(importance_weights, max_importance_weight)
    return batch.replace(
        importance_weight=(logged_actions == model_actions).astype(jnp.float32)
        * importance_weights
    )


def effective_weight(batch: CBInput) -> Array:
    """weight * importance_weight (reference CBInput.effective_weight)."""
    assert batch.importance_weight is not None
    weight = (
        batch.weight
        if batch.weight is not None
        else jnp.ones_like(batch.importance_weight)
    )
    return weight * batch.importance_weight
