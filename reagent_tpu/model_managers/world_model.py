"""World-model managers: MDN-RNN world model and Seq2Reward.

Reference: reagent/model_managers/model_based/world_model.py:24-70 and
seq2reward_model.py:25-78 — build MemoryNetwork / Seq2RewardNetwork from
trainer params and hand them to the world-model trainers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from reagent_tpu.core.parameters import (
    MDNRNNTrainerParameters,
    NormalizationData,
    NormalizationKey,
    Seq2RewardTrainerParameters,
)
from reagent_tpu.core.registry import MODEL_MANAGERS
from reagent_tpu.model_managers.model_manager import ModelManager
from reagent_tpu.models.mdn_rnn import MemoryNetwork
from reagent_tpu.models.seq2reward_model import Seq2RewardNetwork
from reagent_tpu.preprocessing.normalization import get_num_output_features
from reagent_tpu.training.world_model.mdnrnn_trainer import MDNRNNTrainer
from reagent_tpu.training.world_model.seq2reward_trainer import Seq2RewardTrainer


def _dim(normalization_data_map, key, fallback: Optional[int]) -> int:
    if normalization_data_map and key in normalization_data_map:
        return get_num_output_features(
            normalization_data_map[key].dense_normalization_parameters
        )
    assert fallback is not None, f"need {key} normalization or an explicit dim"
    return fallback


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class WorldModel(ModelManager):
    trainer_param: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        known = {f.name for f in dataclasses.fields(MDNRNNTrainerParameters)}
        self.params = MDNRNNTrainerParameters(
            **{k: v for k, v in dict(self.trainer_param).items() if k in known}
        )

    def build_trainer(
        self,
        normalization_data_map: Optional[Dict[str, NormalizationData]] = None,
        use_gpu: bool = False,
        state_dim: Optional[int] = None,
        action_dim: Optional[int] = None,
    ) -> MDNRNNTrainer:
        sdim = _dim(normalization_data_map, NormalizationKey.STATE, state_dim)
        adim = _dim(normalization_data_map, NormalizationKey.ACTION, action_dim)
        memory_network = MemoryNetwork(
            state_dim=sdim,
            action_dim=adim,
            num_hiddens=self.params.hidden_size,
            num_hidden_layers=self.params.num_hidden_layers,
            num_gaussians=self.params.num_gaussians,
        )
        return MDNRNNTrainer(memory_network=memory_network, params=self.params)


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class Seq2RewardModel(ModelManager):
    trainer_param: Dict[str, Any] = dataclasses.field(default_factory=dict)
    net_builder: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        known = {f.name for f in dataclasses.fields(Seq2RewardTrainerParameters)}
        self.params = Seq2RewardTrainerParameters(
            **{k: v for k, v in dict(self.trainer_param).items() if k in known}
        )

    def build_trainer(
        self,
        normalization_data_map: Optional[Dict[str, NormalizationData]] = None,
        use_gpu: bool = False,
        state_dim: Optional[int] = None,
        action_dim: Optional[int] = None,
    ) -> Seq2RewardTrainer:
        sdim = _dim(normalization_data_map, NormalizationKey.STATE, state_dim)
        adim = action_dim or len(self.params.action_names)
        nb = dict(self.net_builder)
        seq2reward_network = Seq2RewardNetwork(
            state_dim=sdim,
            action_dim=adim,
            num_hiddens=nb.get("num_hiddens", 64),
            num_hidden_layers=nb.get("num_hidden_layers", 2),
        )
        return Seq2RewardTrainer(
            seq2reward_network=seq2reward_network, params=self.params
        )
