"""Discrete-action Q-network.

Reference: reagent/models/dqn.py:16 ``FullyConnectedDQN`` (a
FloatFeatureFullyConnected emitting one Q-value per action).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork


class FullyConnectedDQN(nn.Module):
    state_dim: int
    action_dim: int
    sizes: Sequence[int]
    activations: Sequence[str]
    use_batch_norm: bool = False
    dropout_ratio: float = 0.0
    use_layer_norm: bool = False
    use_skip_connections: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, state: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        """state [B, state_dim] -> Q [B, action_dim]."""
        net = FullyConnectedNetwork(
            sizes=[self.state_dim, *self.sizes, self.action_dim],
            activations=[*self.activations, "linear"],
            use_batch_norm=self.use_batch_norm,
            dropout_ratio=self.dropout_ratio,
            use_layer_norm=self.use_layer_norm,
            use_skip_connections=self.use_skip_connections,
            compute_dtype=self.compute_dtype,
        )
        return net(state, training=training)

    def input_prototype(self) -> jnp.ndarray:
        return jnp.zeros((1, self.state_dim))
