"""Discrete-DQN net builders.

Reference: reagent/net_builder/discrete_dqn/{fully_connected.py,dueling.py,
fully_connected_with_embedding.py} + discrete_dqn_net_builder.py:33.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from reagent_tpu.core.parameters import NormalizationData
from reagent_tpu.core.registry import DISCRETE_DQN_NET_BUILDERS
from reagent_tpu.models.dqn import FullyConnectedDQN
from reagent_tpu.models.dueling_q_network import DuelingQNetwork
from reagent_tpu.net_builder.base import state_dim_of


@DISCRETE_DQN_NET_BUILDERS.register()
@dataclasses.dataclass
class FullyConnected:
    sizes: List[int] = dataclasses.field(default_factory=lambda: [256, 128])
    activations: List[str] = dataclasses.field(default_factory=lambda: ["relu", "relu"])
    dropout_ratio: float = 0.0
    use_batch_norm: bool = False

    def build_q_network(
        self,
        state_normalization_data: Optional[NormalizationData],
        output_dim: int,
        state_dim: Optional[int] = None,
    ) -> FullyConnectedDQN:
        return FullyConnectedDQN(
            state_dim=state_dim_of(state_normalization_data, state_dim),
            action_dim=output_dim,
            sizes=list(self.sizes),
            activations=list(self.activations),
            dropout_ratio=self.dropout_ratio,
            use_batch_norm=self.use_batch_norm,
        )


@DISCRETE_DQN_NET_BUILDERS.register()
@dataclasses.dataclass
class Dueling:
    sizes: List[int] = dataclasses.field(default_factory=lambda: [256, 128])
    activations: List[str] = dataclasses.field(default_factory=lambda: ["relu", "relu"])

    def build_q_network(
        self,
        state_normalization_data: Optional[NormalizationData],
        output_dim: int,
        state_dim: Optional[int] = None,
    ) -> DuelingQNetwork:
        return DuelingQNetwork(
            state_dim=state_dim_of(state_normalization_data, state_dim),
            action_dim=output_dim,
            layers=list(self.sizes),
            activations=list(self.activations),
        )


@DISCRETE_DQN_NET_BUILDERS.register()
@dataclasses.dataclass
class FullyConnectedWithEmbedding:
    """Dense + sparse (ID-list) state features -> Q-values.

    Reference: net_builder/discrete_dqn/fully_connected_with_embedding.py —
    builds the EmbeddingBagConcat + FC stack (SparseDQN) for envs with
    jagged ID-list features (e.g. changing-arms).

    ``embedding_configs``: one (name, table_size, embedding_dim) per sparse
    feature, the padded-IdListFeature equivalent of the reference's
    ModelFeatureConfig + torchrec EmbeddingBagConfig.
    """

    sizes: List[int] = dataclasses.field(default_factory=lambda: [256, 128])
    activations: List[str] = dataclasses.field(default_factory=lambda: ["relu", "relu"])
    embedding_configs: List[List] = dataclasses.field(default_factory=list)

    def build_q_network(
        self,
        state_normalization_data: Optional[NormalizationData],
        output_dim: int,
        state_dim: Optional[int] = None,
    ):
        from reagent_tpu.models.embedding_bag import SparseDQN

        return SparseDQN(
            state_dense_dim=state_dim_of(state_normalization_data, state_dim),
            action_dim=output_dim,
            configs=tuple(tuple(c) for c in self.embedding_configs),
            overarch_dims=list(self.sizes),
            activation=self.activations[0] if self.activations else "relu",
        )
