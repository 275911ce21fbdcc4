"""Scorers: pure functions (params, obs) -> action scores for Policy.

Reference: reagent/gym/policies/scorers/{discrete_scorer.py:18-110,
continuous_scorer.py:12-21, slate_q_scorer.py:13-58} — torch no_grad closures
over model objects; here they are pure jittable closures over (network, params).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt

Array = jax.Array

NEG_INF = -1e9  # finite so masked softmax stays well-defined under float32


def apply_possible_actions_mask(
    scores: Array,
    possible_actions_mask: Optional[Array] = None,
    invalid_score: float = NEG_INF,
) -> Array:
    """Invalid actions get invalid_score (ref discrete_scorer.py:18-30)."""
    if possible_actions_mask is None:
        return scores
    return jnp.where(possible_actions_mask.astype(bool), scores, invalid_score)


def discrete_dqn_scorer(q_network) -> Callable:
    """Q scores per action; QR-DQN [B, A, N] heads mean over atoms (ref :33-49)."""

    def score(params, obs: Array, possible_actions_mask: Optional[Array] = None) -> Array:
        scores = q_network.apply(params, obs)
        if scores.ndim == 3:
            scores = scores.mean(axis=2)
        return apply_possible_actions_mask(scores, possible_actions_mask)

    return score


def parametric_dqn_scorer(max_num_actions: int, q_network) -> Callable:
    """Q(s, one-hot a) for every action via a tiled batch (ref :66-88)."""

    def score(params, obs: Array) -> Array:
        B = obs.shape[0]
        tiled = jnp.repeat(obs, max_num_actions, axis=0)
        actions = jnp.tile(jnp.eye(max_num_actions), (B, 1))
        return q_network.apply(params, tiled, actions).reshape(B, max_num_actions)

    return score


def sac_scorer(actor_network) -> Callable:
    """Gaussian policy head: (loc, scale_log) (ref continuous_scorer.py:12-21)."""

    def score(params, obs: Array) -> rlt.GaussianSamplerScore:
        loc, scale_log = actor_network.apply(
            params, obs, False, method="_loc_and_scale_log"
        )
        return rlt.GaussianSamplerScore(loc=loc, scale_log=scale_log)

    return score


def slate_q_scorer(num_candidates: int, q_network) -> Callable:
    """p(select) * Q(s, doc) per candidate (ref slate_q_scorer.py:13-30)."""

    def score(params, state: rlt.FeatureData) -> Array:
        assert state.candidate_docs is not None
        B = state.float_features.shape[0]
        tiled = jnp.repeat(state.float_features, num_candidates, axis=0)
        docs = state.candidate_docs.float_features.reshape(B * num_candidates, -1)
        scores = q_network.apply(params, tiled, docs).reshape(B, num_candidates)
        select_prob = jax.nn.softmax(state.candidate_docs.value, axis=1)
        return select_prob * scores

    return score
