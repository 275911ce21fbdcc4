"""Environments: pure-JAX functional envs + gymnasium adapter."""

from reagent_tpu.gym.envs.functional import (
    CartPole,
    FunctionalEnv,
    FunctionalEnvState,
    Pendulum,
)
from reagent_tpu.gym.envs.gym_env import Gym
from reagent_tpu.gym.envs.extra import (
    ChangingArms,
    LinDyna,
    OpenGridworld,
    RecSimSlate,
    StringGame,
)
from reagent_tpu.gym.envs.pomdp import PocManEnv, ToyVMEnv

__all__ = [
    "CartPole",
    "Pendulum",
    "FunctionalEnv",
    "FunctionalEnvState",
    "Gym",
    "LinDyna",
    "OpenGridworld",
    "StringGame",
    "ChangingArms",
    "RecSimSlate",
    "PocManEnv",
    "ToyVMEnv",
]
