"""ParametricDQN model manager.

Reference: reagent/model_managers/parametric/parametric_dqn.py +
parametric_dqn_base.py — Q(s, a) over feature-vector actions; for discrete
logged actions the batch preprocessor one-hot encodes them as action features.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
import pandas as pd

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import NormalizationData, NormalizationKey
from reagent_tpu.core.registry import MODEL_MANAGERS, PARAMETRIC_DQN_NET_BUILDERS
from reagent_tpu.model_managers.discrete_dqn import DiscreteDQN
from reagent_tpu.preprocessing.batch_preprocessor import DiscreteDqnBatchPreprocessor
from reagent_tpu.training.parametric_dqn_trainer import ParametricDQNTrainer


class _ParametricFromDiscreteBatchPreprocessor(DiscreteDqnBatchPreprocessor):
    """Timeline rows with discrete actions -> ParametricDqnInput."""

    def __call__(self, batch_df: pd.DataFrame) -> rlt.ParametricDqnInput:
        d = super().__call__(batch_df)
        B = d.action.shape[0]
        A = self.num_actions
        tiled = jnp.tile(jnp.eye(A), (B, 1))
        return rlt.ParametricDqnInput(
            state=d.state,
            next_state=d.next_state,
            action=rlt.FeatureData(float_features=d.action),
            next_action=rlt.FeatureData(float_features=d.next_action),
            possible_actions=rlt.FeatureData(float_features=tiled),
            possible_actions_mask=d.possible_actions_mask,
            possible_next_actions=rlt.FeatureData(float_features=tiled),
            possible_next_actions_mask=d.possible_next_actions_mask,
            reward=d.reward,
            time_diff=d.time_diff,
            step=d.step,
            not_terminal=d.not_terminal,
            extras=d.extras,
        )


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class ParametricDQN(DiscreteDQN):
    def build_trainer(
        self,
        normalization_data_map: Dict[str, NormalizationData],
        use_gpu: bool = False,
    ) -> ParametricDQNTrainer:
        state_norm = normalization_data_map[NormalizationKey.STATE]
        num_actions = len(self._param.actions)
        builder = PARAMETRIC_DQN_NET_BUILDERS.build(
            self.net_builder
            if any(k in PARAMETRIC_DQN_NET_BUILDERS.members() for k in self.net_builder)
            else {"FullyConnected": next(iter(self.net_builder.values()))}
        )
        q_network = builder.build_q_network(
            state_norm, None, action_dim=num_actions
        )
        return ParametricDQNTrainer(
            q_network=q_network,
            rl=self.rl_parameters,
            double_q_learning=self._param.double_q_learning,
            optimizer=self._param.optimizer,
        )

    def build_batch_preprocessor(self, normalization_data_map):
        from reagent_tpu.preprocessing.preprocessor import Preprocessor

        state_norm = normalization_data_map[NormalizationKey.STATE]
        return _ParametricFromDiscreteBatchPreprocessor(
            num_actions=len(self._param.actions),
            state_preprocessor=Preprocessor(state_norm.dense_normalization_parameters),
            action_names=self._param.actions,
        )

    def init_trainer_state(self, trainer, rng, state_dim):
        return trainer.init(
            rng, jnp.zeros((1, state_dim)), jnp.zeros((1, len(self._param.actions)))
        )

    def build_serving_module(self, trainer, trainer_state, normalization_data_map):
        """Serve argmax-over-actions Q as a discrete scorer head."""
        from reagent_tpu.prediction.predictor_wrapper import (
            ParametricDqnPredictorWrapper,
            ParametricDqnWithPreprocessor,
        )
        from reagent_tpu.preprocessing.preprocessor import Preprocessor

        state_norm = normalization_data_map[NormalizationKey.STATE]
        pre = Preprocessor(state_norm.dense_normalization_parameters)
        # action preprocessor: identity over one-hot action features
        action_params = {
            i: __import__("reagent_tpu.core.parameters", fromlist=["NormalizationParameters"]).NormalizationParameters(
                feature_type="DO_NOT_PREPROCESS", mean=0.0, stddev=1.0
            )
            for i in range(len(self._param.actions))
        }
        action_pre = Preprocessor(action_params)
        wrapped = ParametricDqnWithPreprocessor(
            trainer.q_network, trainer_state.q_params, pre, action_pre
        )
        return ParametricDqnPredictorWrapper(wrapped)
