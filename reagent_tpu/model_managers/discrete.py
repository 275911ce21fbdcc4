"""Distributional discrete-DQN model managers: C51 and QR-DQN.

Reference: reagent/model_managers/discrete/discrete_c51dqn.py:28-122 and
discrete_qrdqn.py:30-131 — same data plumbing as DiscreteDQN, distributional
nets + trainers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

from reagent_tpu.core.parameters import NormalizationData, NormalizationKey
from reagent_tpu.core.registry import (
    CATEGORICAL_DQN_NET_BUILDERS,
    MODEL_MANAGERS,
    QR_DQN_NET_BUILDERS,
)
from reagent_tpu.model_managers.discrete_dqn import DiscreteDQN
from reagent_tpu.training.c51_trainer import C51Trainer
from reagent_tpu.training.qrdqn_trainer import QRDQNTrainer


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class DiscreteC51DQN(DiscreteDQN):
    net_builder: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"Categorical": {}}
    )

    def build_trainer(
        self,
        normalization_data_map: Dict[str, NormalizationData],
        use_gpu: bool = False,
    ) -> C51Trainer:
        state_norm = normalization_data_map[NormalizationKey.STATE]
        num_actions = len(self._param.actions)
        builder = CATEGORICAL_DQN_NET_BUILDERS.build(self.net_builder)
        q_network = builder.build_q_network(state_norm, output_dim=num_actions)
        return C51Trainer(
            q_network=q_network,
            rl=self.rl_parameters,
            double_q_learning=self._param.double_q_learning,
            optimizer=self._param.optimizer,
            action_names=tuple(self._param.actions),
        )

    def build_serving_module(self, trainer, trainer_state, normalization_data_map):
        """E[Z] scoring artifact (ref discrete_c51dqn.py:96-122)."""
        from reagent_tpu.prediction.predictor_wrapper import (
            CategoricalDqnPredictorWrapper,
        )
        from reagent_tpu.preprocessing.preprocessor import Preprocessor

        state_norm = normalization_data_map[NormalizationKey.STATE]
        pre = Preprocessor(state_norm.dense_normalization_parameters)
        return CategoricalDqnPredictorWrapper(
            trainer.q_network, trainer_state.q_params, pre, self._param.actions
        )


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class DiscreteQRDQN(DiscreteDQN):
    net_builder: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"QuantileFullyConnected": {}}
    )

    def build_trainer(
        self,
        normalization_data_map: Dict[str, NormalizationData],
        use_gpu: bool = False,
    ) -> QRDQNTrainer:
        state_norm = normalization_data_map[NormalizationKey.STATE]
        num_actions = len(self._param.actions)
        builder = QR_DQN_NET_BUILDERS.build(self.net_builder)
        q_network = builder.build_q_network(state_norm, output_dim=num_actions)
        num_atoms = getattr(builder, "num_atoms", 51)
        return QRDQNTrainer(
            q_network=q_network,
            num_atoms=num_atoms,
            rl=self.rl_parameters,
            double_q_learning=self._param.double_q_learning,
            optimizer=self._param.optimizer,
            action_names=tuple(self._param.actions),
        )

    def build_serving_module(self, trainer, trainer_state, normalization_data_map):
        """Mean-over-atoms Q artifact (ref discrete_qrdqn.py:100-131)."""
        from reagent_tpu.prediction.predictor_wrapper import (
            make_quantile_dqn_predictor_wrapper,
        )
        from reagent_tpu.preprocessing.preprocessor import Preprocessor

        state_norm = normalization_data_map[NormalizationKey.STATE]
        pre = Preprocessor(state_norm.dense_normalization_parameters)
        return make_quantile_dqn_predictor_wrapper(
            trainer.q_network, trainer_state.q_params, pre,
            self._param.actions, trainer.num_atoms,
        )
