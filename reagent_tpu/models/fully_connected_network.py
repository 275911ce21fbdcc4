"""Configurable MLP backbone.

Reference: reagent/models/fully_connected_network.py (FullyConnectedNetwork
with per-layer activations, optional batchnorm/dropout/layernorm, residual
connections).  TPU notes: matmuls accumulate in float32 on the MXU; weights
use the reference's gaussian-fill-w-gain init for parity of learning dynamics.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

ACTIVATIONS = {
    "relu": nn.relu,
    "leaky_relu": nn.leaky_relu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "softplus": nn.softplus,
    "linear": lambda x: x,
}


def gaussian_fill_w_gain(key, shape, dtype, gain: float = 1.0, dim_in: Optional[int] = None):
    """N(0, gain * sqrt(2/dim_in)) init (reference fully_connected_network.py:18)."""
    fan_in = dim_in if dim_in is not None else shape[0]
    std = gain * math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


class FullyConnectedNetwork(nn.Module):
    """MLP over the last axis: sizes [in, h1, ..., out].

    ``activations`` has one entry per layer (len(sizes) - 1).
    """

    sizes: Sequence[int]
    activations: Sequence[str]
    use_batch_norm: bool = False
    dropout_ratio: float = 0.0
    use_layer_norm: bool = False
    normalize_output: bool = False
    orthogonal_init: bool = False
    use_skip_connections: bool = False
    # matmul compute dtype (params stay f32); bf16 feeds the MXU directly
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        assert len(self.sizes) - 1 == len(self.activations), (
            f"sizes {self.sizes} vs activations {self.activations}"
        )
        h = x
        n_layers = len(self.sizes) - 1
        for i in range(n_layers):
            h_in = h
            out_dim = self.sizes[i + 1]
            act_name = self.activations[i]
            if self.use_batch_norm:
                h = nn.BatchNorm(use_running_average=not training)(h)
            if self.orthogonal_init:
                kernel_init = nn.initializers.orthogonal(scale=math.sqrt(2.0))
            else:
                gain = math.sqrt(2.0) if act_name == "relu" else 1.0
                kernel_init = (
                    lambda g: lambda key, shape, dtype=jnp.float32: gaussian_fill_w_gain(
                        key, shape, dtype, g, shape[0]
                    )
                )(gain)
            h = nn.Dense(out_dim, kernel_init=kernel_init, dtype=self.compute_dtype)(h)
            is_last = i == n_layers - 1
            if self.use_layer_norm and (not is_last or self.normalize_output):
                h = nn.LayerNorm()(h)
            h = ACTIVATIONS[act_name](h)
            if self.dropout_ratio > 0.0 and (not is_last):
                h = nn.Dropout(rate=self.dropout_ratio, deterministic=not training)(h)
            # residual connection when shapes allow (ref models/residual_wrapper.py,
            # fully_connected_network.py use_skip_connections)
            if self.use_skip_connections and h_in.shape[-1] == h.shape[-1]:
                h = h + h_in
        return h


class FloatFeatureFullyConnected(nn.Module):
    """MLP taking FeatureData-like dense input to a [B, output_dim] tensor."""

    state_dim: int
    output_dim: int
    sizes: Sequence[int]
    activations: Sequence[str]
    use_batch_norm: bool = False
    dropout_ratio: float = 0.0
    use_layer_norm: bool = False
    final_activation: str = "linear"

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        net = FullyConnectedNetwork(
            sizes=[self.state_dim, *self.sizes, self.output_dim],
            activations=[*self.activations, self.final_activation],
            use_batch_norm=self.use_batch_norm,
            dropout_ratio=self.dropout_ratio,
            use_layer_norm=self.use_layer_norm,
        )
        return net(x, training=training)


class ResidualWrapper(nn.Module):
    """x + module(x) (reference models/residual_wrapper.py:6-22)."""

    module: nn.Module

    @nn.compact
    def __call__(self, x: jnp.ndarray, *args, **kwargs) -> jnp.ndarray:
        return x + self.module(x, *args, **kwargs)


class Sequential(nn.Module):
    """Module chain accepting FeatureData-aware blocks (reference
    models/containers.py Sequential)."""

    layers: Tuple[nn.Module, ...]

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        for layer in self.layers:
            x = layer(x)
        return x
