"""Model zoo: flax modules mirroring the reference's reagent/models/ inventory."""

from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork
from reagent_tpu.models.dqn import FullyConnectedDQN
from reagent_tpu.models.dueling_q_network import (
    DuelingQNetwork,
    ParametricDuelingQNetwork,
)
from reagent_tpu.models.categorical_dqn import CategoricalDQN
from reagent_tpu.models.critic import FullyConnectedCritic
from reagent_tpu.models.actor import (
    FullyConnectedActor,
    GaussianFullyConnectedActor,
    DirichletFullyConnectedActor,
)
from reagent_tpu.models.bcq import BatchConstrainedDQN
from reagent_tpu.models.value import ValueNetwork
from reagent_tpu.models.linear_regression import (
    DisjointLinearRegressionUCB,
    LinearRegressionUCB,
)
from reagent_tpu.models.deep_represent_linucb import DeepRepresentLinearRegressionUCB
from reagent_tpu.models.synthetic_reward_sparse import (
    SparseArchSyntheticRewardNet,
    SyntheticRewardSparseArchNet,
)

__all__ = [
    "FullyConnectedNetwork",
    "FullyConnectedDQN",
    "DuelingQNetwork",
    "ParametricDuelingQNetwork",
    "CategoricalDQN",
    "FullyConnectedCritic",
    "FullyConnectedActor",
    "GaussianFullyConnectedActor",
    "DirichletFullyConnectedActor",
    "BatchConstrainedDQN",
    "ValueNetwork",
]
