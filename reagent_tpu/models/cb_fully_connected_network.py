"""Plain FCNN contextual-bandit scorer.

Reference: reagent/models/cb_fully_connected_network.py:17-80 — outputs
{pred_label, pred_sigma, ucb} like the LinUCB family, but with zero predicted
uncertainty (pred_sigma=0 so ucb == pred_label); used as the greedy/supervised
baseline inside the CB trainer stack.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork

Array = jax.Array


class CBFullyConnectedNetwork(nn.Module):
    input_dim: int
    hidden_layer_dims: Sequence[int]
    activation: str = "relu"
    output_activation: str = "linear"
    use_layer_norm: bool = False
    use_skip_connections: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        """[..., input_dim] features -> {pred_label, pred_sigma, ucb} [...]."""
        pred = FullyConnectedNetwork(
            sizes=[self.input_dim, *self.hidden_layer_dims, 1],
            activations=[self.activation] * len(self.hidden_layer_dims)
            + [self.output_activation],
            use_layer_norm=self.use_layer_norm,
            use_skip_connections=self.use_skip_connections,
        )(x).squeeze(-1)
        zero = jnp.zeros_like(pred)
        return {"pred_label": pred, "pred_sigma": zero, "ucb": pred}
