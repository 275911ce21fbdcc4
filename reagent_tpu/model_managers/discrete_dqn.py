"""DiscreteDQN model manager.

Reference: reagent/model_managers/discrete/discrete_dqn.py:29-206 +
discrete_dqn_base.py — builds the q-network from the net-builder union, the
DQNTrainer from trainer_param, batch preprocessors, the eval policy, and the
serving artifact.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from reagent_tpu.core.parameters import (
    EvaluationParameters,
    NormalizationData,
    NormalizationKey,
    RLParameters,
)
import reagent_tpu.net_builder  # noqa: F401 — registers net builders
from reagent_tpu.core.registry import DISCRETE_DQN_NET_BUILDERS, MODEL_MANAGERS
from reagent_tpu.model_managers.model_manager import ModelManager
from reagent_tpu.preprocessing.batch_preprocessor import DiscreteDqnBatchPreprocessor
from reagent_tpu.preprocessing.normalization import (
    get_feature_norm_metadata,
    get_num_output_features,
)
from reagent_tpu.preprocessing.preprocessor import Preprocessor
from reagent_tpu.training.dqn_trainer import DQNTrainer


@dataclasses.dataclass
class DQNTrainerParam:
    """Mirrors the reference's trainer_param block for DiscreteDQN."""

    actions: List[str] = dataclasses.field(default_factory=list)
    rl: Dict[str, Any] = dataclasses.field(default_factory=dict)
    double_q_learning: bool = True
    minibatch_size: int = 512
    minibatches_per_step: int = 1
    optimizer: Dict[str, Any] = dataclasses.field(default_factory=lambda: {"Adam": {"lr": 1e-3}})
    # run the whole update as one fused Pallas kernel (ops/fused_dqn.py /
    # ops/fused_dqn_offline.py): requires a plain dense-MLP q-network, mse
    # loss, Adam, and no CPE heads; ~2x the XLA step at offline batch sizes
    use_fused_kernel: bool = False
    block_size: Any = None  # VMEM block rows for the gridded offline kernel


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class DiscreteDQN(ModelManager):
    trainer_param: Dict[str, Any] = dataclasses.field(default_factory=dict)
    net_builder: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"FullyConnected": {}}
    )
    cpe_net_builder: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"FullyConnected": {}}
    )
    eval_parameters: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        tp = dict(self.trainer_param)
        rl_kwargs = dict(tp.get("rl", {}) or {})
        self._param = DQNTrainerParam(
            actions=[str(a) for a in tp.get("actions", [])],
            rl=rl_kwargs,
            double_q_learning=tp.get("double_q_learning", True),
            minibatch_size=tp.get("minibatch_size", 512),
            optimizer=tp.get("optimizer", {"Adam": {"lr": 1e-3}}),
            use_fused_kernel=tp.get("use_fused_kernel", False),
            block_size=tp.get("block_size"),
        )
        self.rl_parameters = RLParameters(**rl_kwargs)
        self.eval_params = EvaluationParameters(
            **{
                k: v
                for k, v in dict(self.eval_parameters).items()
                if k in {"calc_cpe_in_training"}
            }
        )

    # ------------------------------------------------------------- identify

    def run_feature_identification(self, df: pd.DataFrame) -> Dict[str, NormalizationData]:
        """Fit normalization from state_features (ref identify_types_flow.py:24)."""
        by_feature: Dict[int, List[float]] = {}
        for d in df["state_features"]:
            if not d:
                continue
            for fid, v in d.items():
                by_feature.setdefault(int(fid), []).append(float(v))
        norm_params = {}
        for fid, values in by_feature.items():
            p = get_feature_norm_metadata(
                str(fid),
                values,
                {
                    "feature_overrides": None,
                    "max_unique_enum_values": 10,
                    "quantile_size": 20,
                    "quantile_k2_threshold": 1000.0,
                    "skip_box_cox": False,
                    "skip_quantiles": True,
                },
            )
            if p is not None:
                norm_params[fid] = p
        return {NormalizationKey.STATE: NormalizationData(dense_normalization_parameters=norm_params)}

    # ---------------------------------------------------------------- build

    @property
    def action_names(self) -> List[str]:
        return self._param.actions

    def get_reporter(self):
        from reagent_tpu.reporting.reporters import DiscreteDQNReporter

        return DiscreteDQNReporter(actions=list(self._param.actions))

    def build_trainer(
        self,
        normalization_data_map: Dict[str, NormalizationData],
        use_gpu: bool = False,
    ) -> DQNTrainer:
        state_norm = normalization_data_map[NormalizationKey.STATE]
        num_actions = len(self._param.actions)
        builder = DISCRETE_DQN_NET_BUILDERS.build(self.net_builder)
        q_network = builder.build_q_network(state_norm, output_dim=num_actions)
        reward_network = q_network_cpe = None
        if self.eval_params.calc_cpe_in_training:
            cpe_builder = DISCRETE_DQN_NET_BUILDERS.build(self.cpe_net_builder)
            reward_network = cpe_builder.build_q_network(state_norm, output_dim=num_actions)
            q_network_cpe = cpe_builder.build_q_network(state_norm, output_dim=num_actions)
        if self._param.use_fused_kernel:
            assert not self.eval_params.calc_cpe_in_training, (
                "use_fused_kernel does not support CPE heads; set "
                "eval_parameters.calc_cpe_in_training: false"
            )
            import jax

            from reagent_tpu.training.fused_dqn_trainer import FusedDQNTrainer

            B = self._param.minibatch_size
            block = self._param.block_size
            if block is None and B > 512:
                block = 512  # stream offline-sized batches through VMEM
            return FusedDQNTrainer(
                q_network=q_network,
                rl=self.rl_parameters,
                double_q_learning=self._param.double_q_learning,
                optimizer=self._param.optimizer,
                minibatch_size=B,
                block_size=block,
                interpret=jax.default_backend() != "tpu",
            )
        return DQNTrainer(
            emit_reporter_arrays=True,
            q_network=q_network,
            rl=self.rl_parameters,
            double_q_learning=self._param.double_q_learning,
            optimizer=self._param.optimizer,
            action_names=tuple(self._param.actions),
            reward_network=reward_network,
            q_network_cpe=q_network_cpe,
        )

    def build_batch_preprocessor(
        self, normalization_data_map: Dict[str, NormalizationData]
    ) -> DiscreteDqnBatchPreprocessor:
        state_norm = normalization_data_map[NormalizationKey.STATE]
        return DiscreteDqnBatchPreprocessor(
            num_actions=len(self._param.actions),
            state_preprocessor=Preprocessor(state_norm.dense_normalization_parameters),
            action_names=self._param.actions,
        )

    def state_dim(self, normalization_data_map: Dict[str, NormalizationData]) -> int:
        return get_num_output_features(
            normalization_data_map[NormalizationKey.STATE].dense_normalization_parameters
        )

    def build_serving_module(
        self, trainer: DQNTrainer, trainer_state, normalization_data_map
    ):
        from reagent_tpu.prediction.predictor_wrapper import (
            DiscreteDqnPredictorWrapper,
            DiscreteDqnWithPreprocessor,
        )

        state_norm = normalization_data_map[NormalizationKey.STATE]
        pre = Preprocessor(state_norm.dense_normalization_parameters)
        q_params = (
            trainer.to_flax_params(trainer_state)
            if hasattr(trainer, "to_flax_params")
            else trainer_state.q_params
        )
        wrapped = DiscreteDqnWithPreprocessor(trainer.q_network, q_params, pre)
        return DiscreteDqnPredictorWrapper(wrapped, self._param.actions)
