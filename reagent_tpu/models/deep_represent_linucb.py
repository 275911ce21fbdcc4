"""DeepRepresent LinUCB: trainable MLP feature extractor + LinUCB head.

Reference: reagent/models/deep_represent_linucb.py:16-180 — MLP bottom layers
trained by SGD (nn_e2e: a linear head predicts mu), while the LinUCB last
layer (A, b, coefs, inv_A) is updated by closed-form matrix math and provides
the uncertainty term.  Papers: LinUCB https://arxiv.org/pdf/1003.0146.pdf,
DeepRepresent https://arxiv.org/pdf/2012.01780.pdf.

TPU-native split: the flax MLP params live in one pytree (optax-updated); the
LinUCB sufficient statistics live in a LinUCBState pytree (closed-form
updated); both flow through one jitted train step.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork
from reagent_tpu.models.linear_regression import (
    LinearRegressionUCB,
    LinUCBState,
    batch_quadratic_form,
)

Array = jax.Array


class _DeepRepresentMLP(nn.Module):
    """Bottom layers + linear mu head (ref deep_represent_linucb.py:100-112)."""

    input_dim: int
    sizes: List[int]
    activations: List[str]
    normalize_output: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        h = FullyConnectedNetwork(
            sizes=[self.input_dim, *self.sizes],
            activations=list(self.activations),
        )(x)
        if self.normalize_output:
            h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-6)
        ones = jnp.ones((*h.shape[:-1], 1))
        mlp_out_with_ones = jnp.concatenate([ones, h], axis=-1)
        pred_label = nn.Dense(1, use_bias=False)(mlp_out_with_ones).squeeze(-1)
        return {"mlp_out_with_ones": mlp_out_with_ones, "pred_label": pred_label}


@struct.dataclass
class DeepRepresentLinUCBState:
    mlp_params: Any
    opt_state: Any
    linucb: LinUCBState


class DeepRepresentLinearRegressionUCB(LinearRegressionUCB):
    """UCB = nn-predicted mu + alpha * LinUCB sigma over the MLP embedding."""

    def __init__(
        self,
        input_dim: int,
        sizes: List[int],
        activations: List[str],
        *,
        l2_reg_lambda: float = 1.0,
        ucb_alpha: float = 1.0,
        gamma: float = 1.0,
        normalize_output: bool = True,
    ):
        # LinUCB operates on the MLP output (+1 for the intercept column)
        super().__init__(
            input_dim=sizes[-1] + 1,
            l2_reg_lambda=l2_reg_lambda,
            ucb_alpha=ucb_alpha,
            gamma=gamma,
        )
        assert input_dim > 0 and sizes[-1] > 0
        assert len(sizes) == len(activations)
        self.raw_input_dim = input_dim
        self.mlp = _DeepRepresentMLP(
            input_dim=input_dim,
            sizes=sizes,
            activations=activations,
            normalize_output=normalize_output,
        )

    def init_deep(self, rng: Array) -> Any:
        return self.mlp.init(rng, jnp.zeros((1, self.raw_input_dim)))

    def forward_deep(
        self,
        mlp_params: Any,
        linucb_state: LinUCBState,
        x: Array,
        ucb_alpha: Optional[float] = None,
    ) -> Dict[str, Array]:
        """Raw features -> {pred_label, pred_sigma, ucb, mlp_out_with_ones}."""
        alpha = self.ucb_alpha if ucb_alpha is None else ucb_alpha
        out = self.mlp.apply(mlp_params, x)
        emb = out["mlp_out_with_ones"]
        pred_label = out["pred_label"]
        pred_sigma = jnp.sqrt(
            jnp.clip(
                batch_quadratic_form(emb, linucb_state.inv_avg_A)
                / jnp.maximum(linucb_state.sum_weight, 1e-5),
                0.0,
            )
        )
        return {
            "pred_label": pred_label,
            "pred_sigma": pred_sigma,
            "ucb": pred_label + alpha * pred_sigma,
            "mlp_out_with_ones": emb,
        }
