"""Convolutional backbone for image observations.

Reference: reagent/models/convolutional_network.py — conv stack configured by
ConvNetParameters, followed by a FullyConnectedNetwork head.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.core.parameters import ConvNetParameters
from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork

Array = jax.Array


class ConvolutionalNetwork(nn.Module):
    """[B, H, W, C] image -> [B, output_dim]."""

    conv_params: ConvNetParameters
    input_height: int
    input_width: int
    input_channels: int
    sizes: Sequence[int]
    activations: Sequence[str]
    output_dim: int

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        if x.ndim == 3:
            x = x[..., None]
        p = self.conv_params
        for i, dim in enumerate(p.conv_dims):
            kh = p.conv_height_kernels[i]
            kw = (p.conv_width_kernels or p.conv_height_kernels)[i]
            x = nn.Conv(dim, kernel_size=(kh, kw))(x)
            x = nn.relu(x)
            pool_k = p.pool_kernel_sizes[i]
            if p.pool_types[i] == "max":
                x = nn.max_pool(x, (pool_k, pool_k), strides=(pool_k, pool_k))
            else:
                x = nn.avg_pool(x, (pool_k, pool_k), strides=(pool_k, pool_k))
        x = x.reshape(x.shape[0], -1)
        head = FullyConnectedNetwork(
            sizes=[x.shape[1], *self.sizes, self.output_dim],
            activations=[*self.activations, "linear"],
        )
        return head(x, training=training)
