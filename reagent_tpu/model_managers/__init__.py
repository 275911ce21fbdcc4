"""Model managers: per-algorithm orchestration (reference: reagent/model_managers/)."""

from reagent_tpu.model_managers.discrete_dqn import DiscreteDQN
from reagent_tpu.model_managers.discrete_crr import DiscreteCRR
from reagent_tpu.model_managers.parametric_dqn import ParametricDQN
from reagent_tpu.model_managers.model_manager import ModelManager
from reagent_tpu.model_managers.actor_critic import SAC, TD3, ActorCriticBase
from reagent_tpu.model_managers.discrete import DiscreteC51DQN, DiscreteQRDQN
from reagent_tpu.model_managers.policy_gradient import PPO, Reinforce
from reagent_tpu.model_managers.slate_q import SlateQ
from reagent_tpu.model_managers.world_model import Seq2RewardModel, WorldModel
from reagent_tpu.model_managers.model_based import CrossEntropyMethod, SyntheticReward

__all__ = [
    "ModelManager",
    "DiscreteDQN",
    "DiscreteCRR",
    "ParametricDQN",
    "SAC",
    "TD3",
    "ActorCriticBase",
    "DiscreteC51DQN",
    "DiscreteQRDQN",
    "PPO",
    "Reinforce",
    "SlateQ",
    "WorldModel",
    "Seq2RewardModel",
    "CrossEntropyMethod",
    "SyntheticReward",
]
