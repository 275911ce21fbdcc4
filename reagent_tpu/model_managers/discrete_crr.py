"""DiscreteCRR model manager (offline discrete control).

Reference: reagent/model_managers/discrete/discrete_crr.py (334 LoC) — actor
(logits) + twin critics built from net-builder unions; serving module exports
the actor.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

from reagent_tpu.core.parameters import EvaluationParameters, NormalizationData, NormalizationKey, RLParameters
from reagent_tpu.core.registry import DISCRETE_DQN_NET_BUILDERS, MODEL_MANAGERS
from reagent_tpu.model_managers.discrete_dqn import DiscreteDQN
from reagent_tpu.preprocessing.preprocessor import Preprocessor
from reagent_tpu.training.discrete_crr_trainer import DiscreteCRRTrainer


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class DiscreteCRR(DiscreteDQN):
    """Reuses DiscreteDQN's data plumbing; swaps in the CRR trainer."""

    actor_net_builder: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"FullyConnected": {}}
    )

    def get_reporter(self):
        from reagent_tpu.reporting.reporters import DiscreteCRRReporter

        return DiscreteCRRReporter(actions=list(self._param.actions))

    def build_trainer(
        self,
        normalization_data_map: Dict[str, NormalizationData],
        use_gpu: bool = False,
    ) -> DiscreteCRRTrainer:
        state_norm = normalization_data_map[NormalizationKey.STATE]
        num_actions = len(self._param.actions)
        actor_builder = DISCRETE_DQN_NET_BUILDERS.build(self.actor_net_builder)
        actor_network = actor_builder.build_q_network(state_norm, output_dim=num_actions)
        q_builder = DISCRETE_DQN_NET_BUILDERS.build(self.net_builder)
        q1_network = q_builder.build_q_network(state_norm, output_dim=num_actions)
        q2_network = q_builder.build_q_network(state_norm, output_dim=num_actions)
        tp = dict(self.trainer_param)
        return DiscreteCRRTrainer(
            emit_reporter_arrays=True,
            actor_network=actor_network,
            q1_network=q1_network,
            q2_network=q2_network,
            rl=self.rl_parameters,
            q_network_optimizer=self._param.optimizer,
            actor_network_optimizer=tp.get("actor_network_optimizer", self._param.optimizer),
            beta=tp.get("beta", 1.0),
            max_weight=tp.get("max_weight", 20.0),
        )

    def build_serving_module(self, trainer: DiscreteCRRTrainer, trainer_state, normalization_data_map):
        """Export the ACTOR logits as the serving scorer (ref discrete_crr.py)."""
        from reagent_tpu.prediction.predictor_wrapper import (
            DiscreteDqnPredictorWrapper,
            DiscreteDqnWithPreprocessor,
        )

        state_norm = normalization_data_map[NormalizationKey.STATE]
        pre = Preprocessor(state_norm.dense_normalization_parameters)
        wrapped = DiscreteDqnWithPreprocessor(
            trainer.actor_network, trainer_state.actor_params, pre
        )
        return DiscreteDqnPredictorWrapper(wrapped, self._param.actions)
