"""World-model debug evaluators: loss, feature importance, action sensitivity.

Reference: reagent/evaluation/world_model_evaluator.py:16-246 —
LossEvaluator (per-batch MDN-RNN losses), FeatureImportanceEvaluator (loss
increase from masking a feature to its median / forcing one discrete action),
FeatureSensitivityEvaluator (|Δ predicted next-state| under shuffled actions).

Pure-functional: every evaluator takes the trainer's net params explicitly
(no eval/train mode toggling — flax modules are stateless).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core import types as rlt
from reagent_tpu.training.world_model.mdnrnn_trainer import MDNRNNTrainer

Array = jax.Array


def _median_feature_value(features: Array) -> Array:
    """Enum-style one-hot blocks get their mode; scalars their median
    (ref compute_median_feature_value :159-174)."""
    if features.shape[1] > 1 and set(np.unique(np.asarray(features))) <= {0.0, 1.0}:
        hist = jnp.sum(features, axis=0)
        mode = jnp.zeros_like(features[0]).at[jnp.argmax(hist)].set(1.0)
        return mode[None, :]
    return jnp.median(features, axis=0, keepdims=True)


class LossEvaluator:
    """Reference :16-34."""

    def __init__(self, trainer: MDNRNNTrainer, state_dim: int) -> None:
        self.trainer = trainer
        self.state_dim = state_dim

    def evaluate(self, net_params, batch: rlt.MemoryNetworkInput) -> Dict[str, float]:
        losses = self.trainer.get_loss(net_params, batch)
        return {k: float(v) for k, v in losses.items()}


class FeatureImportanceEvaluator:
    """Loss increase from neutralizing each feature (ref :37-174)."""

    def __init__(
        self,
        trainer: MDNRNNTrainer,
        discrete_action: bool,
        state_feature_num: int,
        action_feature_num: int,
        sorted_action_feature_start_indices: List[int],
        sorted_state_feature_start_indices: List[int],
    ) -> None:
        self.trainer = trainer
        self.discrete_action = discrete_action
        self.state_feature_num = state_feature_num
        self.action_feature_num = action_feature_num
        self.action_starts = sorted_action_feature_start_indices
        self.state_starts = sorted_state_feature_start_indices

    def evaluate(self, net_params, batch: rlt.MemoryNetworkInput) -> Dict[str, np.ndarray]:
        T, B, state_dim = batch.state.float_features.shape
        action_dim = batch.action.float_features.shape[2]
        orig_loss = float(self.trainer.get_loss(net_params, batch)["loss"])
        importance = np.zeros(self.action_feature_num + self.state_feature_num)

        action_bounds = list(self.action_starts) + [action_dim]
        state_bounds = list(self.state_starts) + [state_dim]

        for i in range(self.action_feature_num):
            flat = batch.action.float_features.reshape(T * B, action_dim)
            if self.discrete_action:
                assert action_dim == self.action_feature_num
                vec = jnp.zeros(action_dim).at[i].set(1.0)
                flat = jnp.broadcast_to(vec, flat.shape)
            else:
                lo, hi = action_bounds[i], action_bounds[i + 1]
                flat = flat.at[:, lo:hi].set(_median_feature_value(flat[:, lo:hi]))
            new_batch = batch.replace(
                action=rlt.FeatureData(float_features=flat.reshape(T, B, action_dim))
            )
            importance[i] = (
                float(self.trainer.get_loss(net_params, new_batch)["loss"]) - orig_loss
            )

        for i in range(self.state_feature_num):
            flat = batch.state.float_features.reshape(T * B, state_dim)
            lo, hi = state_bounds[i], state_bounds[i + 1]
            flat = flat.at[:, lo:hi].set(_median_feature_value(flat[:, lo:hi]))
            new_batch = batch.replace(
                state=rlt.FeatureData(float_features=flat.reshape(T, B, state_dim))
            )
            importance[self.action_feature_num + i] = (
                float(self.trainer.get_loss(net_params, new_batch)["loss"]) - orig_loss
            )

        return {"feature_loss_increase": importance}


class FeatureSensitivityEvaluator:
    """|Δ predicted next-state means| under shuffled actions (ref :176-246)."""

    def __init__(
        self,
        trainer: MDNRNNTrainer,
        state_feature_num: int,
        sorted_state_feature_start_indices: List[int],
        rng: Optional[Array] = None,
    ) -> None:
        self.trainer = trainer
        self.state_feature_num = state_feature_num
        self.state_starts = sorted_state_feature_start_indices
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

    def evaluate(self, net_params, batch: rlt.MemoryNetworkInput) -> Dict[str, np.ndarray]:
        T, B, state_dim = batch.next_state.float_features.shape
        out = self.trainer.memory_network.apply(net_params, batch.state, batch.action)
        self.rng, r = jax.random.split(self.rng)
        perm = jax.random.permutation(r, B)
        shuffled = self.trainer.memory_network.apply(
            net_params,
            batch.state,
            rlt.FeatureData(float_features=batch.action.float_features[:, perm, :]),
        )
        bounds = list(self.state_starts) + [state_dim]
        sensitivity = np.zeros(self.state_feature_num)
        for i in range(self.state_feature_num):
            lo, hi = bounds[i], bounds[i + 1]
            sensitivity[i] = float(
                jnp.mean(
                    jnp.sum(
                        jnp.abs(shuffled.mus[..., lo:hi] - out.mus[..., lo:hi]),
                        axis=3,
                    )
                )
            )
        return {"feature_sensitivity": sensitivity}
