"""Actor networks.

Reference: reagent/models/actor.py — ``FullyConnectedActor`` (:44),
``GaussianFullyConnectedActor`` (:113, tanh-squashed gaussian with log-prob
squash correction), ``DirichletFullyConnectedActor`` (:264).

JAX twist: stochastic forward passes take an explicit ``rng`` key instead of
ambient RNG state, so the whole actor-critic update stays a pure function.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.core import types as rlt
from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork

LOG_PROB_MIN = -2.0
LOG_PROB_MAX = 2.0
_EPS = 1e-6


class FullyConnectedActor(nn.Module):
    """Deterministic actor with optional gaussian exploration noise."""

    state_dim: int
    action_dim: int
    sizes: Sequence[int]
    activations: Sequence[str]
    use_batch_norm: bool = False
    action_activation: str = "tanh"
    exploration_variance: Optional[float] = None

    @nn.compact
    def __call__(
        self, state: jnp.ndarray, rng: Optional[jax.Array] = None, training: bool = False
    ) -> rlt.ActorOutput:
        action = FullyConnectedNetwork(
            sizes=[self.state_dim, *self.sizes, self.action_dim],
            activations=[*self.activations, self.action_activation],
            use_batch_norm=self.use_batch_norm,
        )(state, training=training)
        B = action.shape[0]
        if self.exploration_variance is None or rng is None:
            return rlt.ActorOutput(action=action, log_prob=jnp.zeros((B, 1)))
        scale = jnp.asarray(self.exploration_variance)
        noise = jax.random.normal(rng, action.shape) * scale
        log_prob = jnp.clip(
            jnp.sum(
                -(noise / scale) ** 2 / 2
                - jnp.log(scale)
                - 0.5 * math.log(2 * math.pi),
                axis=1,
                keepdims=True,
            ),
            LOG_PROB_MIN,
            LOG_PROB_MAX,
        )
        action = jnp.clip(action + noise, -1.0, 1.0)
        return rlt.ActorOutput(action=action, log_prob=log_prob)

    def input_prototype(self) -> jnp.ndarray:
        return jnp.zeros((1, self.state_dim))


class GaussianFullyConnectedActor(nn.Module):
    """Tanh-squashed gaussian policy (SAC-style) with exact log-prob.

    setup-style module so both ``__call__`` and ``get_log_prob`` are applyable
    entry points sharing the same trunk parameters.
    """

    state_dim: int
    action_dim: int
    sizes: Sequence[int]
    activations: Sequence[str]
    use_layer_norm: bool = False

    def setup(self):
        self.fc = FullyConnectedNetwork(
            sizes=[self.state_dim, *self.sizes, self.action_dim * 2],
            activations=[*self.activations, "linear"],
        )
        if self.use_layer_norm:
            self.loc_ln = nn.LayerNorm()
            self.scale_ln = nn.LayerNorm()

    def _loc_and_scale_log(self, state: jnp.ndarray, training: bool):
        out = self.fc(state, training=training)
        loc = out[:, : self.action_dim]
        scale_log = out[:, self.action_dim :]
        if self.use_layer_norm:
            loc = self.loc_ln(loc)
            scale_log = self.scale_ln(scale_log)
        scale_log = jnp.clip(scale_log, LOG_PROB_MIN, LOG_PROB_MAX)
        return loc, scale_log

    @staticmethod
    def _normal_log_prob(r: jnp.ndarray, scale_log: jnp.ndarray) -> jnp.ndarray:
        """log N(loc + r*scale; loc, scale) in terms of r (ref actor.py:167-182)."""
        return -(r**2) / 2 - scale_log - 0.5 * math.log(2 * math.pi)

    @staticmethod
    def _squash_correction(squashed: jnp.ndarray) -> jnp.ndarray:
        """d tanh^-1 correction: log(1 - a^2) (ref actor.py:184-189)."""
        return jnp.log(1 - squashed**2 + _EPS)

    @staticmethod
    def _squash(raw: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip(jnp.tanh(raw), -1.0 + _EPS, 1.0 - _EPS)

    def __call__(
        self, state: jnp.ndarray, rng: Optional[jax.Array] = None, training: bool = False
    ) -> rlt.ActorOutput:
        loc, scale_log = self._loc_and_scale_log(state, training)
        if rng is None:
            r = jnp.zeros_like(scale_log)
        else:
            r = jax.random.normal(rng, scale_log.shape)
        raw_action = loc + r * jnp.exp(scale_log)
        squashed = self._squash(raw_action)
        log_prob = jnp.sum(
            self._normal_log_prob(r, scale_log) - self._squash_correction(squashed),
            axis=1,
            keepdims=True,
        )
        return rlt.ActorOutput(
            action=squashed, log_prob=log_prob, squashed_mean=self._squash(loc)
        )

    def get_log_prob(
        self, state: jnp.ndarray, squashed_action: jnp.ndarray, training: bool = False
    ) -> jnp.ndarray:
        """Log-prob of an externally supplied (tanh-squashed) action."""
        loc, scale_log = self._loc_and_scale_log(state, training)
        raw = jnp.arctanh(jnp.clip(squashed_action, -1.0 + _EPS, 1.0 - _EPS))
        r = (raw - loc) / jnp.exp(scale_log)
        return jnp.sum(
            self._normal_log_prob(r, scale_log) - self._squash_correction(
                self._squash(raw)
            ),
            axis=1,
            keepdims=True,
        )

    def input_prototype(self) -> jnp.ndarray:
        return jnp.zeros((1, self.state_dim))


class DirichletFullyConnectedActor(nn.Module):
    """Actions on the simplex via a Dirichlet policy (ref actor.py:264)."""

    state_dim: int
    action_dim: int
    sizes: Sequence[int]
    activations: Sequence[str]

    @nn.compact
    def __call__(
        self, state: jnp.ndarray, rng: Optional[jax.Array] = None, training: bool = False
    ) -> rlt.ActorOutput:
        # softplus+1 keeps concentration > 1 so log-prob is bounded
        # (reference actor.py:289-296).
        concentration = (
            nn.softplus(
                FullyConnectedNetwork(
                    sizes=[self.state_dim, *self.sizes, self.action_dim],
                    activations=[*self.activations, "linear"],
                )(state, training=training)
            )
            + 1.0
        )
        if rng is None:
            action = concentration / jnp.sum(concentration, axis=1, keepdims=True)
        else:
            action = jax.random.dirichlet(rng, concentration)
        log_prob = _dirichlet_log_prob(concentration, action)
        return rlt.ActorOutput(action=action, log_prob=log_prob[:, None])

    def input_prototype(self) -> jnp.ndarray:
        return jnp.zeros((1, self.state_dim))


def _dirichlet_log_prob(conc: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, _EPS, 1.0)
    log_norm = jnp.sum(jax.scipy.special.gammaln(conc), axis=1) - jax.scipy.special.gammaln(
        jnp.sum(conc, axis=1)
    )
    return jnp.sum((conc - 1.0) * jnp.log(x), axis=1) - log_norm
