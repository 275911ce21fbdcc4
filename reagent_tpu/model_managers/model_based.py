"""Model-based managers: CrossEntropyMethod planner and SyntheticReward.

Reference: reagent/model_managers/model_based/cross_entropy_method.py:33-152
(CEM planner over an MDN-RNN ensemble + CEMPolicy) and synthetic_reward.py:60-268
(synthetic-reward net builder union + RewardNetTrainer).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np

from reagent_tpu.core.parameters import (
    CEMTrainerParameters,
    MDNRNNTrainerParameters,
    NormalizationData,
    NormalizationKey,
)
import reagent_tpu.net_builder  # noqa: F401
from reagent_tpu.core.registry import MODEL_MANAGERS, SYNTHETIC_REWARD_NET_BUILDERS
from reagent_tpu.model_managers.model_manager import ModelManager
from reagent_tpu.models.cem_planner import CEMPlannerNetwork
from reagent_tpu.models.mdn_rnn import MemoryNetwork
from reagent_tpu.preprocessing.normalization import get_num_output_features
from reagent_tpu.training.cem_trainer import CEMTrainer
from reagent_tpu.training.reward_network_trainer import LossFunction, RewardNetTrainer
from reagent_tpu.training.world_model.mdnrnn_trainer import MDNRNNTrainer


def _dim(normalization_data_map, key, fallback: Optional[int]) -> int:
    if normalization_data_map and key in normalization_data_map:
        return get_num_output_features(
            normalization_data_map[key].dense_normalization_parameters
        )
    assert fallback is not None, f"need {key} normalization or an explicit dim"
    return fallback


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class CrossEntropyMethod(ModelManager):
    trainer_param: Dict[str, Any] = dataclasses.field(default_factory=dict)
    discrete_action: bool = True

    def __post_init__(self):
        tp = dict(self.trainer_param)
        mdnrnn_kwargs = dict(tp.pop("mdnrnn", {}) or {})
        known = {f.name for f in dataclasses.fields(MDNRNNTrainerParameters)}
        mdnrnn = MDNRNNTrainerParameters(
            **{k: v for k, v in mdnrnn_kwargs.items() if k in known}
        )
        cem_known = {f.name for f in dataclasses.fields(CEMTrainerParameters)} - {"mdnrnn"}
        self.params = CEMTrainerParameters(
            mdnrnn=mdnrnn, **{k: v for k, v in tp.items() if k in cem_known}
        )

    def build_trainer(
        self,
        normalization_data_map: Optional[Dict[str, NormalizationData]] = None,
        use_gpu: bool = False,
        state_dim: Optional[int] = None,
        action_dim: Optional[int] = None,
        action_upper_bounds: Optional[np.ndarray] = None,
        action_lower_bounds: Optional[np.ndarray] = None,
    ) -> CEMTrainer:
        p = self.params
        sdim = _dim(normalization_data_map, NormalizationKey.STATE, state_dim)
        adim = (
            action_dim
            if action_dim is not None
            else _dim(normalization_data_map, NormalizationKey.ACTION, None)
        )
        mem_net = MemoryNetwork(
            state_dim=sdim,
            action_dim=adim,
            num_hiddens=p.mdnrnn.hidden_size,
            num_hidden_layers=p.mdnrnn.num_hidden_layers,
            num_gaussians=p.mdnrnn.num_gaussians,
        )
        world_model_trainers: List[MDNRNNTrainer] = [
            MDNRNNTrainer(memory_network=mem_net, params=p.mdnrnn)
            for _ in range(p.num_world_models)
        ]
        cem_planner_network = CEMPlannerNetwork(
            mem_net=mem_net,
            mem_net_params_list=[None] * p.num_world_models,  # filled post-training
            cem_num_iterations=p.cem_num_iterations,
            cem_population_size=p.cem_population_size,
            ensemble_population_size=p.ensemble_population_size,
            num_elites=p.num_elites,
            plan_horizon_length=p.plan_horizon_length,
            state_dim=sdim,
            action_dim=adim,
            discrete_action=self.discrete_action,
            terminal_effective=True,
            gamma=1.0,
            action_upper_bounds=action_upper_bounds,
            action_lower_bounds=action_lower_bounds,
        )
        return CEMTrainer(
            cem_planner_network=cem_planner_network,
            world_model_trainers=world_model_trainers,
            parameters=p,
        )


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class SyntheticReward(ModelManager):
    """Learn per-step rewards from delayed episode feedback (ref :60-268)."""

    trainer_param: Dict[str, Any] = dataclasses.field(default_factory=dict)
    net_builder: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"SingleStepSyntheticReward": {}}
    )

    def __post_init__(self):
        self._tp = dict(self.trainer_param)

    def build_trainer(
        self,
        normalization_data_map: Optional[Dict[str, NormalizationData]] = None,
        use_gpu: bool = False,
        state_dim: Optional[int] = None,
        action_dim: Optional[int] = None,
    ) -> RewardNetTrainer:
        sdim = _dim(normalization_data_map, NormalizationKey.STATE, state_dim)
        adim = (
            action_dim
            if action_dim is not None
            else _dim(normalization_data_map, NormalizationKey.ACTION, None)
        )
        builder = SYNTHETIC_REWARD_NET_BUILDERS.build(self.net_builder)
        reward_net = builder.build_synthetic_reward_network(
            None, None, state_dim=sdim, action_dim=adim
        )
        tp = self._tp
        loss = tp.get("loss_type", "MSE")
        return RewardNetTrainer(
            reward_net=reward_net,
            optimizer=tp.get("optimizer"),
            loss_type=LossFunction[loss] if isinstance(loss, str) else loss,
            reward_ignore_threshold=tp.get("reward_ignore_threshold"),
            weighted_by_inverse_propensity=tp.get(
                "weighted_by_inverse_propensity", False
            ),
        )
