"""BCQ imitator helpers: mask actions the behavior model finds implausible.

Reference: reagent/training/imitator_training.py:13-26 — used by the BCQ path
of DQNTrainer to drop actions whose imitator propensity is below
``drop_threshold`` relative to the argmax action.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp

Array = jax.Array


def get_valid_actions_from_imitator(
    imitator: Union[Callable[[Array], Array], tuple],
    float_features: Array,
    drop_threshold: float,
) -> Array:
    """[B, A] float mask of viable actions under the imitator.

    ``imitator`` is either a callable features -> logits, or an
    (nn.Module, params) pair.
    """
    if isinstance(imitator, tuple):
        module, params = imitator
        logits = module.apply(params, float_features)
    else:
        logits = imitator(float_features)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=1)
    filter_values = probs / jnp.max(probs, axis=1, keepdims=True)
    return (filter_values >= drop_threshold).astype(jnp.float32)
