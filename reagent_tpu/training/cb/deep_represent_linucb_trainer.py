"""DeepRepresent LinUCB trainer: SGD on the MLP + closed-form LinUCB update.

Reference: reagent/training/cb/deep_represent_linucb_trainer.py:18-110 — each
step (1) MSE between the nn mu-head and the observed reward backprops through
the MLP, (2) the (stop-gradient) MLP embedding updates the LinUCB sufficient
statistics, (3) coefficients are re-solved.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from reagent_tpu.core import types as rlt
from reagent_tpu.models.deep_represent_linucb import (
    DeepRepresentLinearRegressionUCB,
    DeepRepresentLinUCBState,
)

Array = jax.Array


class DeepRepresentLinUCBTrainer:
    def __init__(
        self,
        scorer: DeepRepresentLinearRegressionUCB,
        lr: float = 1e-3,
        weight_decay: float = 0.0,
    ):
        assert isinstance(scorer, DeepRepresentLinearRegressionUCB)
        self.scorer = scorer
        self.optimizer = (
            optax.adamw(lr, weight_decay=weight_decay)
            if weight_decay
            else optax.adam(lr)
        )

    def init(self, rng: Array) -> DeepRepresentLinUCBState:
        mlp_params = self.scorer.init_deep(rng)
        return DeepRepresentLinUCBState(
            mlp_params=mlp_params,
            opt_state=self.optimizer.init(mlp_params),
            linucb=self.scorer.init(),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: DeepRepresentLinUCBState, batch: rlt.CBInput
    ) -> Tuple[DeepRepresentLinUCBState, Dict[str, Array]]:
        assert batch.action is not None and batch.reward is not None
        row = jnp.arange(batch.context_arm_features.shape[0])
        x = batch.context_arm_features[row, batch.action.reshape(-1)]
        y = batch.reward.reshape(-1)
        weight = batch.weight.reshape(-1) if batch.weight is not None else jnp.ones_like(y)

        def loss_fn(mlp_params):
            out = self.scorer.mlp.apply(mlp_params, x)
            loss = jnp.mean(weight * (out["pred_label"] - y) ** 2)
            return loss, out["mlp_out_with_ones"]

        (loss, emb), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.mlp_params)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.mlp_params
        )
        mlp_params = optax.apply_updates(state.mlp_params, updates)
        # LinUCB stats on the (frozen) embedding; re-solve coefs each step
        # (ref: "coefficients are automatically re-computed at every step")
        linucb = self.scorer.update(
            state.linucb, jax.lax.stop_gradient(emb), y, weight
        )
        linucb = self.scorer.calculate_coefs(linucb)
        return (
            DeepRepresentLinUCBState(
                mlp_params=mlp_params, opt_state=opt_state, linucb=linucb
            ),
            {"mse_loss": loss, "num_obs": linucb.num_obs},
        )

    def score(
        self,
        state: DeepRepresentLinUCBState,
        batch: rlt.CBInput,
        ucb_alpha: Optional[float] = None,
    ) -> Array:
        """UCB per arm: [B, num_arms]."""
        B, K, D = batch.context_arm_features.shape
        flat = batch.context_arm_features.reshape(B * K, D)
        out = self.scorer.forward_deep(state.mlp_params, state.linucb, flat, ucb_alpha)
        return out["ucb"].reshape(B, K)
