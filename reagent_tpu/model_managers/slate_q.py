"""SlateQ model manager.

Reference: reagent/model_managers/slate_q_base.py + discrete/slate_q.py —
a parametric Q(s, doc) critic scored per candidate, decomposed over the slate
by the SlateQ trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp

from reagent_tpu.core.parameters import (
    NormalizationData,
    NormalizationKey,
    RLParameters,
)
import reagent_tpu.net_builder  # noqa: F401
from reagent_tpu.core.registry import MODEL_MANAGERS, PARAMETRIC_DQN_NET_BUILDERS
from reagent_tpu.model_managers.model_manager import ModelManager
from reagent_tpu.preprocessing.normalization import get_num_output_features
from reagent_tpu.training.slate_q_trainer import SlateQTrainer


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class SlateQ(ModelManager):
    slate_size: int = -1
    num_candidates: int = -1
    trainer_param: Dict[str, Any] = dataclasses.field(default_factory=dict)
    net_builder: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"FullyConnected": {}}
    )

    def get_reporter(self):
        from reagent_tpu.reporting.reporters import SlateQReporter

        return SlateQReporter()

    def __post_init__(self):
        assert self.slate_size > 0, f"slate_size is invalid: {self.slate_size}"
        tp = dict(self.trainer_param)
        self.rl_parameters = RLParameters(**dict(tp.get("rl", {}) or {}))
        self._tp = tp

    def build_trainer(
        self,
        normalization_data_map: Optional[Dict[str, NormalizationData]] = None,
        use_gpu: bool = False,
        state_dim: Optional[int] = None,
        candidate_dim: Optional[int] = None,
    ) -> SlateQTrainer:
        if normalization_data_map:
            state_dim = get_num_output_features(
                normalization_data_map[NormalizationKey.STATE].dense_normalization_parameters
            )
            candidate_dim = get_num_output_features(
                normalization_data_map[NormalizationKey.ITEM].dense_normalization_parameters
            )
        q_network = PARAMETRIC_DQN_NET_BUILDERS.build(self.net_builder).build_q_network(
            None, None, state_dim=state_dim, action_dim=candidate_dim
        )
        tp = self._tp
        return SlateQTrainer(
            emit_reporter_arrays=True,
            q_network=q_network,
            slate_size=self.slate_size,
            rl=self.rl_parameters,
            optimizer=tp.get("optimizer"),
            single_selection=tp.get("single_selection", True),
            discount_time_scale=tp.get("discount_time_scale"),
        )

    def init_trainer_state(self, trainer, rng, state_dim, candidate_dim=None):
        cdim = candidate_dim or trainer.q_network.action_dim
        return trainer.init(rng, jnp.zeros((1, state_dim)), jnp.zeros((1, cdim)))
