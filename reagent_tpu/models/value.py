"""State-value network V(s).

Reference: reagent/net_builder/value/fully_connected.py + models used by SAC's
optional value network and seq2slate baselines.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork


class ValueNetwork(nn.Module):
    state_dim: int
    sizes: Sequence[int]
    activations: Sequence[str]

    @nn.compact
    def __call__(self, state: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        return FullyConnectedNetwork(
            sizes=[self.state_dim, *self.sizes, 1],
            activations=[*self.activations, "linear"],
        )(state, training=training)

    def input_prototype(self) -> jnp.ndarray:
        return jnp.zeros((1, self.state_dim))
