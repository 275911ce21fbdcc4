"""MLP slate scorer: per-candidate log-space scores.

Reference: reagent/models/mlp_scorer.py:12-41.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from reagent_tpu.core import types as rlt
from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork


class MLPScorer(nn.Module):
    """Scores each candidate doc with an MLP; optionally concat user feats."""

    input_dim: int
    sizes: Sequence[int]
    activations: Sequence[str]
    has_user_feat: bool = False

    @nn.compact
    def __call__(self, obs: rlt.FeatureData) -> jnp.ndarray:
        mlp_input = obs.get_ranking_state(self.has_user_feat)
        mlp = FullyConnectedNetwork(
            sizes=[self.input_dim, *self.sizes, 1],
            activations=[*self.activations, "linear"],
        )
        if self.has_user_feat:
            # [B, user+docs] concat scored as one vector -> [B]
            return mlp(mlp_input).squeeze(-1)
        # [B, D, cdim] per-doc scores -> [B, D]
        return mlp(mlp_input).squeeze(-1)
