"""Dueling Q-networks.

Reference: reagent/models/dueling_q_network.py:21 ``DuelingQNetwork`` and
:129 ``ParametricDuelingQNetwork`` — shared backbone with separate advantage
and value heads, Q = V + A - mean(A).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork


class DuelingQNetwork(nn.Module):
    state_dim: int
    action_dim: int
    layers: Sequence[int]  # hidden sizes of shared backbone
    activations: Sequence[str]
    num_atoms: int = 1  # >1 for distributional (QR) dueling heads

    @nn.compact
    def __call__(self, state: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        shared = FullyConnectedNetwork(
            sizes=[self.state_dim, *self.layers],
            activations=list(self.activations),
        )(state, training=training)
        embedding_dim = self.layers[-1]
        half = embedding_dim // 2
        adv = FullyConnectedNetwork(
            sizes=[embedding_dim, half, self.action_dim * self.num_atoms],
            activations=[self.activations[-1], "linear"],
        )(shared, training=training)
        val = FullyConnectedNetwork(
            sizes=[embedding_dim, half, self.num_atoms],
            activations=[self.activations[-1], "linear"],
        )(shared, training=training)
        B = state.shape[0]
        if self.num_atoms > 1:
            adv = adv.reshape(B, self.action_dim, self.num_atoms)
            val = val.reshape(B, 1, self.num_atoms)
        q = val + adv - jnp.mean(adv, axis=1, keepdims=True)
        if self.num_atoms == 1:
            q = q.reshape(B, self.action_dim)
        return q

    def input_prototype(self) -> jnp.ndarray:
        return jnp.zeros((1, self.state_dim))


class ParametricDuelingQNetwork(nn.Module):
    """Q(s, a) for feature-vector actions: advantage head sees (state_emb, action)."""

    state_dim: int
    action_dim: int
    layers: Sequence[int]
    activations: Sequence[str]

    @nn.compact
    def __call__(
        self, state: jnp.ndarray, action: jnp.ndarray, training: bool = False
    ) -> jnp.ndarray:
        state_emb = FullyConnectedNetwork(
            sizes=[self.state_dim, *self.layers],
            activations=list(self.activations),
        )(state, training=training)
        embedding_dim = self.layers[-1]
        half = embedding_dim // 2
        val = FullyConnectedNetwork(
            sizes=[embedding_dim, half, 1],
            activations=[self.activations[-1], "linear"],
        )(state_emb, training=training)
        adv_in = jnp.concatenate([state_emb, action], axis=1)
        adv = FullyConnectedNetwork(
            sizes=[embedding_dim + self.action_dim, half, 1],
            activations=[self.activations[-1], "linear"],
        )(adv_in, training=training)
        return val + adv  # [B, 1]

    def input_prototype(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return jnp.zeros((1, self.state_dim)), jnp.zeros((1, self.action_dim))
