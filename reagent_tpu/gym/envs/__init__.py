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
from reagent_tpu.gym.envs.extra import StringGameV1
from reagent_tpu.gym.envs.pomdp import PocManEnv, ToyVMEnv
from reagent_tpu.gym.envs.recsim import RecSimInterestEvolution
from reagent_tpu.gym.envs.oracle_pvm import OraclePVM
from reagent_tpu.gym.envs.state_embed import StateEmbedEnv
from reagent_tpu.gym.envs.functionality import PossibleActionsMaskTester

from reagent_tpu.core.registry import ENVS as _ENVS

# YAML-selectable env union (reference gym/envs/__init__.py:21-67 Env__Union):
# every functional env registers under its class name; ``Gym`` registers in
# gym_env.py.  build_env({"CartPole": {}}) mirrors Env__Union.value.
for _env_cls in (
    CartPole, Pendulum, LinDyna, OpenGridworld, StringGame, StringGameV1,
    ChangingArms, RecSimSlate, RecSimInterestEvolution, PocManEnv, ToyVMEnv,
    OraclePVM, StateEmbedEnv,
    PossibleActionsMaskTester,
):
    if _env_cls.__name__ not in _ENVS.members():
        _ENVS.register()(_env_cls)


def build_env(config):
    """Construct an env from a tagged-union config, e.g. {"CartPole": {}}."""
    return _ENVS.build(config)


__all__ = [
    "build_env",
    "StringGameV1",
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
    "RecSimInterestEvolution",
    "PocManEnv",
    "ToyVMEnv",
    "OraclePVM",
    "StateEmbedEnv",
    "PossibleActionsMaskTester",
]
