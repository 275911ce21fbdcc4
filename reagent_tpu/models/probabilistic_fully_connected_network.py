"""Probabilistic (Bayes-by-backprop) fully connected network.

Reference: reagent/models/probabilistic_fully_connected_network.py —
LinearBBB:26 (variational linear layer, mean-field gaussian posterior) and
FullyConnectedProbabilisticNetwork:110 (stack of LinearBBB with sample_elbo
training loss).  Flax modules with explicit rng threading: each forward is a
single posterior draw; `sample_elbo` vmaps the draw across samples so XLA
batches all Monte-Carlo forwards into one kernel.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _gaussian_kl(mu: Array, sigma: Array, prior_sigma: float) -> Array:
    """KL(N(mu, sigma) || N(0, prior_sigma)), summed over elements."""
    return jnp.sum(
        jnp.log(prior_sigma / sigma)
        + (sigma**2 + mu**2) / (2 * prior_sigma**2)
        - 0.5
    )


class LinearBBB(nn.Module):
    """Variational linear layer (reference :26-108)."""

    in_dim: int
    out_dim: int
    prior_sigma: float = 1.0

    @nn.compact
    def __call__(self, x: Array, rng: Array) -> Tuple[Array, Array]:
        w_mu = self.param("w_mu", nn.initializers.lecun_normal(), (self.in_dim, self.out_dim))
        w_rho = self.param("w_rho", nn.initializers.constant(-3.0), (self.in_dim, self.out_dim))
        b_mu = self.param("b_mu", nn.initializers.zeros, (self.out_dim,))
        b_rho = self.param("b_rho", nn.initializers.constant(-3.0), (self.out_dim,))
        w_sigma = jax.nn.softplus(w_rho)
        b_sigma = jax.nn.softplus(b_rho)
        kw, kb = jax.random.split(rng)
        w = w_mu + w_sigma * jax.random.normal(kw, w_mu.shape)
        b = b_mu + b_sigma * jax.random.normal(kb, b_mu.shape)
        kl = _gaussian_kl(w_mu, w_sigma, self.prior_sigma) + _gaussian_kl(
            b_mu, b_sigma, self.prior_sigma
        )
        return x @ w + b, kl


class FullyConnectedProbabilisticNetwork(nn.Module):
    """Stack of LinearBBB layers (reference :110-214).

    __call__ returns one posterior-sample prediction and the total KL;
    sample_elbo averages the gaussian NLL over num_samples posterior draws
    and adds the KL — the training loss of BayesByBackpropTrainer.
    """

    sizes: Sequence[int]  # [in, hidden..., out]
    activations: Sequence[str]
    prior_sigma: float = 1.0
    noise_tol: float = 0.1

    @nn.compact
    def __call__(self, x: Array, rng: Array) -> Tuple[Array, Array]:
        total_kl = 0.0
        h = x
        for i in range(len(self.sizes) - 1):
            rng, sub = jax.random.split(rng)
            h, kl = LinearBBB(self.sizes[i], self.sizes[i + 1], self.prior_sigma)(h, sub)
            total_kl = total_kl + kl
            act = self.activations[i] if i < len(self.activations) else "linear"
            if act == "relu":
                h = jax.nn.relu(h)
            elif act == "tanh":
                h = jnp.tanh(h)
            elif act == "sigmoid":
                h = jax.nn.sigmoid(h)
        return h, total_kl

    def sample_elbo(
        self, params, x: Array, target: Array, num_samples: int, rng: Array
    ) -> Array:
        """Monte-Carlo ELBO loss (reference :190-214)."""

        def draw(key):
            pred, kl = self.apply(params, x, key)
            nll = 0.5 * jnp.sum((pred.reshape(target.shape) - target) ** 2) / (
                self.noise_tol**2
            )
            return nll, kl

        nlls, kls = jax.vmap(draw)(jax.random.split(rng, num_samples))
        return jnp.mean(nlls) + jnp.mean(kls)
