"""Bayes-by-backprop reward-uncertainty trainer.

Reference: reagent/training/cfeval/bayes_by_backprop_trainer.py:15 — trains a
variational (mean-field gaussian) MLP on logged bandit rewards; the ELBO loss
is the sampled NLL plus the KL to the prior (Blundell et al. 2015).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from reagent_tpu.core import types as rlt
from reagent_tpu.optim import make_optimizer

Array = jax.Array


class BayesianMLP(nn.Module):
    """Mean-field gaussian weights via the local reparameterization trick."""

    in_dim: int
    hidden: int
    out_dim: int
    prior_sigma: float = 1.0

    @nn.compact
    def __call__(self, x: Array, rng: Array) -> Tuple[Array, Array]:
        """Returns (prediction, kl)."""
        kl = 0.0
        h = x
        dims = [(self.in_dim, self.hidden), (self.hidden, self.out_dim)]
        for li, (din, dout) in enumerate(dims):
            mu = self.param(f"w{li}_mu", nn.initializers.lecun_normal(), (din, dout))
            rho = self.param(
                f"w{li}_rho", nn.initializers.constant(-5.0), (din, dout)
            )
            b = self.param(f"b{li}", nn.initializers.zeros, (dout,))
            sigma = jax.nn.softplus(rho)
            eps = jax.random.normal(jax.random.fold_in(rng, li), (din, dout))
            w = mu + sigma * eps
            h = h @ w + b
            if li == 0:
                h = nn.relu(h)
            # KL(q || N(0, prior_sigma^2)) per weight, summed
            kl = kl + jnp.sum(
                jnp.log(self.prior_sigma / sigma)
                + (sigma**2 + mu**2) / (2 * self.prior_sigma**2)
                - 0.5
            )
        return h, kl


@struct.dataclass
class BayesByBackpropTrainerState:
    params: Any
    opt_state: Any
    rng: Array
    step: Array


class BayesByBackpropTrainer:
    def __init__(
        self,
        net: BayesianMLP,
        optimizer: Any = None,
        kl_weight: float = 1e-3,
    ):
        self.net = net
        self.optimizer = make_optimizer(optimizer)
        self.kl_weight = kl_weight

    def init(self, rng: Array, obs_proto: Array) -> BayesByBackpropTrainerState:
        r1, r2 = jax.random.split(rng)
        params = self.net.init(r1, obs_proto, r2)
        return BayesByBackpropTrainerState(
            params=params,
            opt_state=self.optimizer.init(params),
            rng=r2,
            step=jnp.zeros((), jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: BayesByBackpropTrainerState, batch: rlt.BanditRewardModelInput
    ) -> Tuple[BayesByBackpropTrainerState, Dict[str, Array]]:
        rng, r = jax.random.split(state.rng)
        x = jnp.concatenate(
            [batch.state.float_features, batch.action], axis=1
        )
        y = batch.reward.reshape(-1, 1)

        def loss_fn(params):
            pred, kl = self.net.apply(params, x, r)
            nll = jnp.mean((pred - y) ** 2)
            return nll + self.kl_weight * kl / x.shape[0], (nll, kl)

        (loss, (nll, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, rng=rng, step=state.step + 1),
            {"loss": loss, "nll": nll, "kl": kl},
        )

    def predict_with_uncertainty(
        self, state: BayesByBackpropTrainerState, x: Array, num_samples: int = 32
    ) -> Tuple[Array, Array]:
        """Monte-carlo mean + std of the predictive distribution."""
        def one(i):
            pred, _ = self.net.apply(state.params, x, jax.random.fold_in(state.rng, i))
            return pred

        preds = jax.vmap(one)(jnp.arange(num_samples))
        return jnp.mean(preds, axis=0), jnp.std(preds, axis=0)
