"""Parametric-action critic Q(s, a).

Reference: reagent/models/critic.py:37 ``FullyConnectedCritic``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork


class FullyConnectedCritic(nn.Module):
    state_dim: int
    action_dim: int
    sizes: Sequence[int]
    activations: Sequence[str]
    use_batch_norm: bool = False
    use_layer_norm: bool = False
    output_dim: int = 1

    @nn.compact
    def __call__(
        self, state: jnp.ndarray, action: jnp.ndarray, training: bool = False
    ) -> jnp.ndarray:
        x = jnp.concatenate([state, action], axis=1)
        net = FullyConnectedNetwork(
            sizes=[self.state_dim + self.action_dim, *self.sizes, self.output_dim],
            activations=[*self.activations, "linear"],
            use_batch_norm=self.use_batch_norm,
            use_layer_norm=self.use_layer_norm,
        )
        return net(x, training=training)

    def input_prototype(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return jnp.zeros((1, self.state_dim)), jnp.zeros((1, self.action_dim))
