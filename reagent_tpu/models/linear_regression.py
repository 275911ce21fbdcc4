"""Linear-regression UCB models (LinUCB).

Reference: reagent/models/linear_regression.py:92 ``LinearRegressionUCB`` —
running weighted averages of A = X^T X and b = X^T y with lazy coefficient
computation, UCB = x.coefs + alpha * sqrt(x A^-1 x / sum_weight); and
reagent/models/disjoint_linucb_predictor.py (per-arm A/b).

TPU-native: the model is a pytree state + pure update/predict functions, so
batch updates and scoring jit cleanly; the distributed reduction of (A, b)
is a ``psum`` over the data axis instead of DDP buffer syncs.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


def batch_quadratic_form(x: Array, A: Array) -> Array:
    """row-wise x^T A x (reference linear_regression.py:41)."""
    return jnp.einsum("bi,ij,bj->b", x, A, x)


@struct.dataclass
class LinUCBState:
    avg_A: Array  # [D, D] weighted average of x x^T
    avg_b: Array  # [D]
    sum_weight: Array  # scalar
    num_obs: Array  # scalar int
    coefs: Array  # [D]
    inv_avg_A: Array  # [D, D]


class LinearRegressionUCB:
    """Joint LinUCB: one regression over (context, arm) features."""

    def __init__(
        self,
        input_dim: int,
        l2_reg_lambda: float = 1.0,
        ucb_alpha: float = 1.0,
        gamma: float = 1.0,
    ):
        assert 0.0 < gamma <= 1.0
        self.input_dim = input_dim
        self.l2_reg_lambda = l2_reg_lambda
        self.ucb_alpha = ucb_alpha
        self.gamma = gamma

    def init(self) -> LinUCBState:
        D = self.input_dim
        return LinUCBState(
            avg_A=jnp.zeros((D, D)),
            avg_b=jnp.zeros(D),
            sum_weight=jnp.asarray(1e-5),
            num_obs=jnp.zeros((), jnp.int32),
            coefs=jnp.zeros(D),
            inv_avg_A=jnp.zeros((D, D)),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def update(
        self, state: LinUCBState, x: Array, y: Array, weight: Optional[Array] = None
    ) -> LinUCBState:
        """Fold a batch into the weighted averages (ref linucb_trainer.py:51-77)."""
        y = y.reshape(-1, 1)
        if weight is None:
            weight = jnp.ones_like(y)
        weight = weight.reshape(-1, 1).astype(jnp.float32)
        batch_w = jnp.sum(weight)
        new_sum_weight = state.sum_weight + batch_w
        frac_old = state.sum_weight / new_sum_weight
        avg_A = state.avg_A * frac_old + (x.T @ (x * weight)) / new_sum_weight
        avg_b = state.avg_b * frac_old + (x.T @ (y * weight)).reshape(-1) / new_sum_weight
        return state.replace(
            avg_A=avg_A,
            avg_b=avg_b,
            sum_weight=new_sum_weight,
            num_obs=state.num_obs + y.shape[0],
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def calculate_coefs(self, state: LinUCBState) -> LinUCBState:
        """Solve the ridge regression (ref linear_regression.py:157-199)."""
        A_ext = state.avg_A + self.l2_reg_lambda * jnp.eye(self.input_dim) / state.sum_weight
        inv_A = jnp.linalg.pinv(A_ext)
        coefs = inv_A @ state.avg_b
        return state.replace(coefs=coefs, inv_avg_A=inv_A)

    def apply_discounting(self, state: LinUCBState) -> LinUCBState:
        """gamma-discount the effective sample size (ref linucb_trainer.py:89)."""
        return state.replace(sum_weight=state.sum_weight * self.gamma)

    @functools.partial(jax.jit, static_argnums=0)
    def forward(
        self, state: LinUCBState, x: Array, ucb_alpha: Optional[float] = None
    ) -> Dict[str, Array]:
        """Assumes ``calculate_coefs`` was called after the last update."""
        alpha = self.ucb_alpha if ucb_alpha is None else ucb_alpha
        pred_label = x @ state.coefs
        pred_sigma = jnp.sqrt(
            jnp.clip(batch_quadratic_form(x, state.inv_avg_A) / state.sum_weight, 0.0)
        )
        ucb = pred_label + alpha * pred_sigma
        return {"pred_label": pred_label, "pred_sigma": pred_sigma, "ucb": ucb}


@struct.dataclass
class DisjointLinUCBState:
    A: Array  # [num_arms, D, D]
    b: Array  # [num_arms, D]
    inv_A: Array  # [num_arms, D, D]
    coefs: Array  # [num_arms, D]
    num_obs: Array


class DisjointLinearRegressionUCB:
    """One independent ridge regression per arm (reference disjoint_linucb_predictor.py)."""

    def __init__(self, num_arms: int, input_dim: int, l2_reg_lambda: float = 1.0, ucb_alpha: float = 1.0):
        self.num_arms = num_arms
        self.input_dim = input_dim
        self.l2_reg_lambda = l2_reg_lambda
        self.ucb_alpha = ucb_alpha

    def init(self) -> DisjointLinUCBState:
        D, K = self.input_dim, self.num_arms
        eye = jnp.broadcast_to(self.l2_reg_lambda * jnp.eye(D), (K, D, D))
        return DisjointLinUCBState(
            A=eye,
            b=jnp.zeros((K, D)),
            inv_A=jnp.broadcast_to(jnp.eye(D) / self.l2_reg_lambda, (K, D, D)),
            coefs=jnp.zeros((K, D)),
            num_obs=jnp.zeros((), jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def update(
        self, state: DisjointLinUCBState, arm: Array, x: Array, y: Array
    ) -> DisjointLinUCBState:
        """Batched per-arm updates via one-hot scatter (arm [B], x [B,D], y [B])."""
        onehot = jax.nn.one_hot(arm, self.num_arms)  # [B, K]
        dA = jnp.einsum("bk,bi,bj->kij", onehot, x, x)
        db = jnp.einsum("bk,bi,b->ki", onehot, x, y.reshape(-1))
        return state.replace(
            A=state.A + dA, b=state.b + db, num_obs=state.num_obs + x.shape[0]
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def calculate_coefs(self, state: DisjointLinUCBState) -> DisjointLinUCBState:
        inv_A = jnp.linalg.pinv(state.A)
        coefs = jnp.einsum("kij,kj->ki", inv_A, state.b)
        return state.replace(inv_A=inv_A, coefs=coefs)

    @functools.partial(jax.jit, static_argnums=0)
    def forward(
        self, state: DisjointLinUCBState, x: Array, ucb_alpha: Optional[float] = None
    ) -> Dict[str, Array]:
        """x [B, D] -> scores for every arm [B, K]."""
        alpha = self.ucb_alpha if ucb_alpha is None else ucb_alpha
        pred = jnp.einsum("bd,kd->bk", x, state.coefs)
        sigma = jnp.sqrt(
            jnp.clip(jnp.einsum("bi,kij,bj->bk", x, state.inv_A, x), 0.0)
        )
        return {"pred_label": pred, "pred_sigma": sigma, "ucb": pred + alpha * sigma}
