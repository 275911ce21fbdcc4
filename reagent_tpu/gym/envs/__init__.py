"""Environments: pure-JAX functional envs + gymnasium adapter."""

from reagent_tpu.gym.envs.functional import (
    CartPole,
    FunctionalEnv,
    FunctionalEnvState,
    Pendulum,
)
from reagent_tpu.gym.envs.gym_env import Gym

__all__ = ["CartPole", "Pendulum", "FunctionalEnv", "FunctionalEnvState", "Gym"]
