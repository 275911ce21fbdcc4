"""Fused small-MLP forward as one Pallas kernel.

For policy scoring the nets are tiny ([obs, 128, 64, A]); under XLA each layer
is a separate HBM round-trip dominated by dispatch + memory latency.  This
kernel keeps all weights and activations resident in VMEM and runs the whole
forward in one grid step per batch tile — one HBM read of the inputs, one
write of the outputs.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _act(name: str, x: Array) -> Array:
    if name == "relu":
        return jnp.maximum(x, 0)
    if name == "leaky_relu":
        return jnp.where(x > 0, x, 0.01 * x)
    if name == "tanh":
        return jnp.tanh(x)
    return x


def fused_mlp_forward(
    x: Array,
    weights: Sequence[Tuple[Array, Array]],
    activations: Sequence[str],
    block_b: int = 256,
    interpret: bool = False,
) -> Array:
    """y = MLP(x) with all layers fused in VMEM.

    x: [B, D_in]; weights: [(W_i [d_i, d_{i+1}], b_i [d_{i+1}])...];
    activations: one per layer.
    """
    assert len(weights) == len(activations)
    B = x.shape[0]
    out_dim = weights[-1][0].shape[1]
    n_layers = len(weights)

    def kernel(x_ref, *refs):
        w_refs = refs[: 2 * n_layers]
        o_ref = refs[2 * n_layers]
        h = x_ref[:].astype(jnp.float32)
        for i in range(n_layers):
            w = w_refs[2 * i][:]
            b = w_refs[2 * i + 1][:]
            h = (
                jnp.dot(h, w, preferred_element_type=jnp.float32)
                + b[None, :]
            )
            h = _act(activations[i], h)
        o_ref[:] = h

    bb = min(block_b, B)
    grid = (pl.cdiv(B, bb),)
    in_specs = [
        pl.BlockSpec((bb, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    flat_weights = []
    for w, b in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM))
        flat_weights.extend([w, b])

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_dim), jnp.float32),
        interpret=interpret,
    )(x, *flat_weights)


def mlp_params_to_weight_list(params) -> list:
    """Flax FC-network params -> [(kernel, bias), ...] in layer order."""
    from reagent_tpu.prediction.predictor_wrapper import _extract_dense_layers

    return [(jnp.asarray(k), jnp.asarray(b)) for k, b in _extract_dense_layers(params)]
