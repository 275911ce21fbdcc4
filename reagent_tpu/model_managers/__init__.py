"""Model managers: per-algorithm orchestration (reference: reagent/model_managers/)."""

from reagent_tpu.model_managers.discrete_dqn import DiscreteDQN
from reagent_tpu.model_managers.discrete_crr import DiscreteCRR
from reagent_tpu.model_managers.parametric_dqn import ParametricDQN
from reagent_tpu.model_managers.model_manager import ModelManager
from reagent_tpu.model_managers.actor_critic import SAC, TD3, ActorCriticBase

__all__ = [
    "ModelManager",
    "DiscreteDQN",
    "DiscreteCRR",
    "ParametricDQN",
    "SAC",
    "TD3",
    "ActorCriticBase",
]
