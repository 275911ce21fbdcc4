"""Categorical (C51) distributional Q-network.

Reference: reagent/models/categorical_dqn.py:12 — a distribution network
emitting [B, num_actions, num_atoms] logits; Q = sum(softmax(logits) * support).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork


class CategoricalDQN(nn.Module):
    state_dim: int
    action_dim: int
    num_atoms: int
    qmin: float
    qmax: float
    sizes: Sequence[int]
    activations: Sequence[str]

    @property
    def support(self) -> jnp.ndarray:
        return jnp.linspace(self.qmin, self.qmax, self.num_atoms)

    @nn.compact
    def log_dist(self, state: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        """Log-probabilities over atoms: [B, action_dim, num_atoms]."""
        net = FullyConnectedNetwork(
            sizes=[self.state_dim, *self.sizes, self.action_dim * self.num_atoms],
            activations=[*self.activations, "linear"],
        )
        logits = net(state, training=training).reshape(
            state.shape[0], self.action_dim, self.num_atoms
        )
        return jax.nn.log_softmax(logits, axis=2)

    def __call__(self, state: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        """Returns Q-values [B, action_dim] (mean of the distribution)."""
        log_dist = self.log_dist(state, training=training)
        return jnp.sum(jnp.exp(log_dist) * self.support, axis=2)

    def input_prototype(self) -> jnp.ndarray:
        return jnp.zeros((1, self.state_dim))
