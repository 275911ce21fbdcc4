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
from reagent_tpu.gym.envs.oracle_pvm import OraclePVM
from reagent_tpu.gym.envs.state_embed import StateEmbedEnv
from reagent_tpu.gym.envs.functionality import PossibleActionsMaskTester

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
    "OraclePVM",
    "StateEmbedEnv",
    "PossibleActionsMaskTester",
]
