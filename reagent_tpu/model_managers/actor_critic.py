"""Actor-critic model managers: SAC and TD3 (continuous control).

Reference: reagent/model_managers/actor_critic_base.py (state+action feature
identification, PolicyNetworkInput batch preprocessing, actor serving export)
and reagent/model_managers/actor_critic/{sac.py:36-131, td3.py:33-122} (net
builder unions -> trainer wiring).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import pandas as pd

from reagent_tpu.core.parameters import (
    NormalizationData,
    NormalizationKey,
    RLParameters,
)
import reagent_tpu.net_builder  # noqa: F401 — registers net builders
from reagent_tpu.core.registry import (
    CONTINUOUS_ACTOR_NET_BUILDERS,
    MODEL_MANAGERS,
    PARAMETRIC_DQN_NET_BUILDERS,
    VALUE_NET_BUILDERS,
)
from reagent_tpu.model_managers.model_manager import ModelManager
from reagent_tpu.preprocessing.batch_preprocessor import PolicyNetworkBatchPreprocessor
from reagent_tpu.preprocessing.normalization import (
    get_feature_norm_metadata,
    get_num_output_features,
)
from reagent_tpu.preprocessing.preprocessor import Preprocessor
from reagent_tpu.training.sac_trainer import SACTrainer
from reagent_tpu.training.td3_trainer import TD3Trainer


def _identify(column: pd.Series, skip_preprocess: bool = False) -> Dict[int, Any]:
    by_feature: Dict[int, List[float]] = {}
    for d in column:
        if not d:
            continue
        for fid, v in d.items():
            by_feature.setdefault(int(fid), []).append(float(v))
    out = {}
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
            if skip_preprocess:
                p = dataclasses.replace(p, feature_type="DO_NOT_PREPROCESS")
            out[fid] = p
    return out


@dataclasses.dataclass
class ActorCriticBase(ModelManager):
    """Shared plumbing for continuous-control managers (ref actor_critic_base.py:60-280)."""

    trainer_param: Dict[str, Any] = dataclasses.field(default_factory=dict)
    actor_net_builder: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"GaussianFullyConnected": {}}
    )
    critic_net_builder: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"FullyConnected": {}}
    )
    # actions are raw continuous vectors; don't renormalize them by default
    preprocess_actions: bool = False

    def __post_init__(self):
        import types as _types

        tp = dict(self.trainer_param)
        self.rl_parameters = RLParameters(**dict(tp.get("rl", {}) or {}))
        self._tp = tp
        # train_workflow reads manager._param.minibatch_size (training.py:119)
        self._param = _types.SimpleNamespace(
            minibatch_size=tp.get("minibatch_size", 256), actions=[]
        )

    # ------------------------------------------------------------- identify

    def run_feature_identification(self, df: pd.DataFrame) -> Dict[str, NormalizationData]:
        """State AND action normalization (ref actor_critic_base.py:150-180)."""
        return {
            NormalizationKey.STATE: NormalizationData(
                dense_normalization_parameters=_identify(df["state_features"])
            ),
            NormalizationKey.ACTION: NormalizationData(
                dense_normalization_parameters=_identify(
                    df["action"], skip_preprocess=not self.preprocess_actions
                )
            ),
        }

    def state_dim(self, normalization_data_map: Dict[str, NormalizationData]) -> int:
        return get_num_output_features(
            normalization_data_map[NormalizationKey.STATE].dense_normalization_parameters
        )

    def action_dim(self, normalization_data_map: Dict[str, NormalizationData]) -> int:
        return get_num_output_features(
            normalization_data_map[NormalizationKey.ACTION].dense_normalization_parameters
        )

    def build_batch_preprocessor(
        self, normalization_data_map: Dict[str, NormalizationData]
    ) -> PolicyNetworkBatchPreprocessor:
        return PolicyNetworkBatchPreprocessor(
            state_preprocessor=Preprocessor(
                normalization_data_map[NormalizationKey.STATE].dense_normalization_parameters
            ),
            action_preprocessor=Preprocessor(
                normalization_data_map[NormalizationKey.ACTION].dense_normalization_parameters
            ),
        )

    def init_trainer_state(self, trainer, rng, state_dim: int, action_dim: Optional[int] = None):
        # build_trainer stashes the identified action dim; the workflow hook
        # only passes state_dim (workflow/training.py:122-125)
        adim = action_dim or getattr(self, "_action_dim", 1)
        return trainer.init(rng, jnp.zeros((1, state_dim)), jnp.zeros((1, adim)))

    def build_serving_module(self, trainer, trainer_state, normalization_data_map):
        """Export the actor as the serving module (ref actor_critic_base.py:282)."""
        from reagent_tpu.prediction.predictor_wrapper import (
            ActorPredictorWrapper,
            ActorWithPreprocessor,
        )

        state_norm = normalization_data_map[NormalizationKey.STATE]
        pre = Preprocessor(state_norm.dense_normalization_parameters)
        # rescale the tanh-squashed [-1, 1] action back to serving units
        # (reference actor_critic_base.py:282 passes the action postprocessor)
        post = None
        action_norm = normalization_data_map.get(NormalizationKey.ACTION)
        if action_norm is not None:
            from reagent_tpu.preprocessing.postprocessor import Postprocessor

            post = Postprocessor(action_norm.dense_normalization_parameters)
        wrapped = ActorWithPreprocessor(
            trainer.actor_network, trainer_state.actor_params, pre,
            action_postprocessor=post,
        )
        return ActorPredictorWrapper(wrapped)


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class SAC(ActorCriticBase):
    """SAC manager (ref model_managers/actor_critic/sac.py:36-118)."""

    value_net_builder: Optional[Dict[str, Any]] = None
    use_2_q_functions: bool = True
    serve_mean_policy: bool = True

    def build_trainer(
        self,
        normalization_data_map: Dict[str, NormalizationData],
        use_gpu: bool = False,
    ) -> SACTrainer:
        sdim = self.state_dim(normalization_data_map)
        adim = self.action_dim(normalization_data_map)
        self._action_dim = adim
        actor = CONTINUOUS_ACTOR_NET_BUILDERS.build(self.actor_net_builder).build_actor(
            None, None, state_dim=sdim, action_dim=adim
        )
        critic_builder = PARAMETRIC_DQN_NET_BUILDERS.build(self.critic_net_builder)
        q1 = critic_builder.build_q_network(None, None, state_dim=sdim, action_dim=adim)
        q2 = (
            critic_builder.build_q_network(None, None, state_dim=sdim, action_dim=adim)
            if self.use_2_q_functions
            else None
        )
        value = None
        if self.value_net_builder:
            value = VALUE_NET_BUILDERS.build(self.value_net_builder).build_value_network(
                None, state_dim=sdim
            )
        tp = self._tp
        return SACTrainer(
            actor_network=actor,
            q1_network=q1,
            q2_network=q2,
            value_network=value,
            rl=self.rl_parameters,
            q_network_optimizer=tp.get("q_network_optimizer"),
            actor_network_optimizer=tp.get("actor_network_optimizer"),
            value_network_optimizer=tp.get("value_network_optimizer"),
            alpha_optimizer=tp.get("alpha_optimizer", "default"),
            entropy_temperature=tp.get("entropy_temperature", 0.2),
            target_entropy=tp.get("target_entropy", -1.0),
            crr_config=tp.get("crr_config"),
        )


@MODEL_MANAGERS.register()
@dataclasses.dataclass
class TD3(ActorCriticBase):
    """TD3 manager (ref model_managers/actor_critic/td3.py:33-110)."""

    actor_net_builder: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"FullyConnected": {}}
    )
    use_2_q_functions: bool = True

    def build_trainer(
        self,
        normalization_data_map: Dict[str, NormalizationData],
        use_gpu: bool = False,
    ) -> TD3Trainer:
        sdim = self.state_dim(normalization_data_map)
        adim = self.action_dim(normalization_data_map)
        self._action_dim = adim
        actor = CONTINUOUS_ACTOR_NET_BUILDERS.build(self.actor_net_builder).build_actor(
            None, None, state_dim=sdim, action_dim=adim
        )
        critic_builder = PARAMETRIC_DQN_NET_BUILDERS.build(self.critic_net_builder)
        q1 = critic_builder.build_q_network(None, None, state_dim=sdim, action_dim=adim)
        q2 = (
            critic_builder.build_q_network(None, None, state_dim=sdim, action_dim=adim)
            if self.use_2_q_functions
            else None
        )
        tp = self._tp
        return TD3Trainer(
            actor_network=actor,
            q1_network=q1,
            q2_network=q2,
            rl=self.rl_parameters,
            q_network_optimizer=tp.get("q_network_optimizer"),
            actor_network_optimizer=tp.get("actor_network_optimizer"),
            noise_variance=tp.get("noise_variance", 0.2),
            noise_clip=tp.get("noise_clip", 0.5),
            delayed_policy_update=tp.get("delayed_policy_update", 2),
        )
