"""Pure-JAX environments: classic-control dynamics as jittable step functions.

The reference trains against host OpenAI-Gym processes (reagent/gym/envs/gym.py).
On TPU that interleaving is the bottleneck (SURVEY §7 hard-part 4), so the
benchmark envs are re-implemented as pure functions of (state, action, rng) —
the standard classic-control equations (Barto-Sutton-Anderson cartpole; pendulum
swing-up) — enabling thousands of env steps per second *inside* the learner jit
and vectorization over parallel envs with ``vmap``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class FunctionalEnvState:
    physics: Array  # env-specific internal state vector
    t: Array  # int32 step counter


class FunctionalEnv:
    """Protocol: static config + pure reset/step."""

    observation_dim: int
    action_dim: int  # num discrete actions, or continuous action dim
    discrete: bool
    max_steps: int

    #: uniforms consumed by ``reset_from_uniform`` (noise-tape fast path)
    reset_noise_dim: int = 0

    def reset(self, rng: Array) -> Tuple[FunctionalEnvState, Array]:
        raise NotImplementedError

    def reset_from_uniform(self, u: Array) -> Tuple[FunctionalEnvState, Array]:
        """Reset from ``reset_noise_dim`` pre-drawn U[0,1) values.

        Lets fused loops pre-generate all reset randomness as one vectorized
        draw (a noise tape) instead of splitting keys per step.
        """
        raise NotImplementedError

    def step(
        self, state: FunctionalEnvState, action: Array, rng: Array
    ) -> Tuple[FunctionalEnvState, Array, Array, Array]:
        """-> (new_state, obs, reward, done)."""
        raise NotImplementedError


class CartPole(FunctionalEnv):
    """CartPole with the classic dynamics (euler integration).

    Matches gymnasium CartPole-v1 semantics: reward 1 per step, termination at
    |x| > 2.4 or |theta| > 12 deg, truncation at ``max_steps``.
    """

    observation_dim = 4
    action_dim = 2
    discrete = True

    GRAVITY = 9.8
    MASSCART = 1.0
    MASSPOLE = 0.1
    LENGTH = 0.5  # half pole length
    FORCE_MAG = 10.0
    TAU = 0.02
    THETA_THRESHOLD = 12 * 2 * jnp.pi / 360
    X_THRESHOLD = 2.4

    def __init__(self, max_steps: int = 500):
        self.max_steps = max_steps

    reset_noise_dim = 4

    def reset(self, rng: Array):
        physics = jax.random.uniform(rng, (4,), minval=-0.05, maxval=0.05)
        return FunctionalEnvState(physics=physics, t=jnp.zeros((), jnp.int32)), physics

    def reset_from_uniform(self, u: Array):
        physics = -0.05 + 0.1 * u
        return FunctionalEnvState(physics=physics, t=jnp.zeros((), jnp.int32)), physics

    def step(self, state: FunctionalEnvState, action: Array, rng: Array):
        x, x_dot, theta, theta_dot = state.physics
        force = jnp.where(action.astype(jnp.int32) == 1, self.FORCE_MAG, -self.FORCE_MAG)
        costheta = jnp.cos(theta)
        sintheta = jnp.sin(theta)
        total_mass = self.MASSCART + self.MASSPOLE
        polemass_length = self.MASSPOLE * self.LENGTH
        temp = (force + polemass_length * theta_dot**2 * sintheta) / total_mass
        thetaacc = (self.GRAVITY * sintheta - costheta * temp) / (
            self.LENGTH * (4.0 / 3.0 - self.MASSPOLE * costheta**2 / total_mass)
        )
        xacc = temp - polemass_length * thetaacc * costheta / total_mass
        x = x + self.TAU * x_dot
        x_dot = x_dot + self.TAU * xacc
        theta = theta + self.TAU * theta_dot
        theta_dot = theta_dot + self.TAU * thetaacc
        physics = jnp.stack([x, x_dot, theta, theta_dot])
        t = state.t + 1
        terminated = jnp.logical_or(
            jnp.abs(x) > self.X_THRESHOLD, jnp.abs(theta) > self.THETA_THRESHOLD
        )
        truncated = t >= self.max_steps
        done = jnp.logical_or(terminated, truncated)
        reward = jnp.asarray(1.0, jnp.float32)
        return FunctionalEnvState(physics=physics, t=t), physics, reward, done


class Pendulum(FunctionalEnv):
    """Pendulum-v1 swing-up: obs [cos th, sin th, thdot], torque in [-2, 2]."""

    observation_dim = 3
    action_dim = 1
    discrete = False

    MAX_SPEED = 8.0
    MAX_TORQUE = 2.0
    DT = 0.05
    G = 10.0
    M = 1.0
    L = 1.0

    def __init__(self, max_steps: int = 200):
        self.max_steps = max_steps

    def _obs(self, physics: Array) -> Array:
        th, thdot = physics
        return jnp.stack([jnp.cos(th), jnp.sin(th), thdot])

    reset_noise_dim = 2

    def reset(self, rng: Array):
        r1, r2 = jax.random.split(rng)
        th = jax.random.uniform(r1, (), minval=-jnp.pi, maxval=jnp.pi)
        thdot = jax.random.uniform(r2, (), minval=-1.0, maxval=1.0)
        physics = jnp.stack([th, thdot])
        return (
            FunctionalEnvState(physics=physics, t=jnp.zeros((), jnp.int32)),
            self._obs(physics),
        )

    def reset_from_uniform(self, u: Array):
        th = -jnp.pi + 2.0 * jnp.pi * u[0]
        thdot = -1.0 + 2.0 * u[1]
        physics = jnp.stack([th, thdot])
        return (
            FunctionalEnvState(physics=physics, t=jnp.zeros((), jnp.int32)),
            self._obs(physics),
        )

    def step(self, state: FunctionalEnvState, action: Array, rng: Array):
        th, thdot = state.physics
        u = jnp.clip(jnp.reshape(action, ()), -self.MAX_TORQUE, self.MAX_TORQUE)
        angle_norm = ((th + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        cost = angle_norm**2 + 0.1 * thdot**2 + 0.001 * u**2
        newthdot = thdot + (
            3.0 * self.G / (2.0 * self.L) * jnp.sin(th)
            + 3.0 / (self.M * self.L**2) * u
        ) * self.DT
        newthdot = jnp.clip(newthdot, -self.MAX_SPEED, self.MAX_SPEED)
        newth = th + newthdot * self.DT
        physics = jnp.stack([newth, newthdot])
        t = state.t + 1
        done = t >= self.max_steps
        return (
            FunctionalEnvState(physics=physics, t=t),
            self._obs(physics),
            -cost.astype(jnp.float32),
            done,
        )
