"""Discrete-actor net builder (reference: net_builder/discrete_actor/)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from reagent_tpu.core.parameters import NormalizationData
from reagent_tpu.core.registry import DISCRETE_ACTOR_NET_BUILDERS
from reagent_tpu.models.dqn import FullyConnectedDQN
from reagent_tpu.net_builder.base import state_dim_of


@DISCRETE_ACTOR_NET_BUILDERS.register()
@dataclasses.dataclass
class FullyConnected:
    sizes: List[int] = dataclasses.field(default_factory=lambda: [128, 64])
    activations: List[str] = dataclasses.field(default_factory=lambda: ["relu", "relu"])

    def build_actor(
        self,
        state_normalization_data: Optional[NormalizationData],
        num_actions: int,
        state_dim: Optional[int] = None,
    ) -> FullyConnectedDQN:
        # a logits network over discrete actions
        return FullyConnectedDQN(
            state_dim=state_dim_of(state_normalization_data, state_dim),
            action_dim=num_actions,
            sizes=list(self.sizes),
            activations=list(self.activations),
        )
