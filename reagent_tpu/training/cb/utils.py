"""Contextual-bandit training utilities.

Reference: reagent/training/cb/utils.py:16-142 — ``add_chosen_arm_features``
(gather chosen-arm features into the batch), ``argmax_random_tie_breaks``
(row-wise argmax with consistent random tie randomization), and
``get_model_actions`` (masked argmax action selection).

TPU design: all three are pure jnp functions (usable inside jit). Tie
randomization takes an explicit PRNG key instead of global torch RNG state;
masked argmax uses an additive -inf mask instead of torch masked tensors.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from reagent_tpu.core.types import CBInput

NEG_INF = -1e30


def add_chosen_arm_features(
    batch: Union[CBInput, List[CBInput]],
) -> Union[CBInput, List[CBInput]]:
    """Populate ``features_of_chosen_arm`` (and ``chosen_arm_id``).

    Joint models: batch.context_arm_features is [B, num_arms, arm_dim] and
    batch.action [B, 1] selects the arm per row. Disjoint models: a list of
    per-arm batches whose 2-D features pass through unchanged.
    """
    if isinstance(batch, CBInput):
        assert batch.context_arm_features.ndim == 3
        assert batch.action is not None
        act = batch.action.reshape(-1).astype(jnp.int32)
        chosen = jnp.take_along_axis(
            batch.context_arm_features, act[:, None, None], axis=1
        )[:, 0, :]
        updates = {"features_of_chosen_arm": chosen}
        if batch.arms is not None:
            updates["chosen_arm_id"] = jnp.take_along_axis(
                batch.arms, act[:, None], axis=1
            )
        return dataclasses.replace(batch, **updates)
    elif isinstance(batch, list):
        assert isinstance(batch[0], CBInput)
        assert batch[0].context_arm_features.ndim == 2
        return [
            dataclasses.replace(b, features_of_chosen_arm=b.context_arm_features)
            for b in batch
        ]
    raise ValueError(f"Unexpected input type {type(batch)} for add_chosen_arm_features")


def argmax_random_tie_breaks(
    scores: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Row-wise argmax; ties are broken by one shared random column permutation.

    Matches the reference's property that the same tied columns resolve the
    same way on every row (reference :74-112 permutes columns once).
    """
    assert scores.ndim == 2
    num_cols = scores.shape[1]
    if rng is None:
        raise ValueError(
            "argmax_random_tie_breaks requires an explicit rng: the reference "
            "draws fresh randomness per call, so a silent fixed default key "
            "would make 'randomized' tie-breaking deterministic."
        )
    perm = jax.random.permutation(rng, num_cols)
    permuted = scores[:, perm]
    if mask is not None:
        permuted = jnp.where(mask[:, perm].astype(bool), permuted, NEG_INF)
    max_idx_in_perm = jnp.argmax(permuted, axis=1)
    return perm[max_idx_in_perm]


def get_model_actions(
    scores: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    randomize_ties: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """[B, 1] chosen-action indices = masked row argmax (reference :114-142)."""
    if randomize_ties:
        return argmax_random_tie_breaks(scores, mask, rng).reshape(-1, 1)
    if mask is not None:
        scores = jnp.where(mask.astype(bool), scores, NEG_INF)
    return jnp.argmax(scores, axis=1).reshape(-1, 1)
