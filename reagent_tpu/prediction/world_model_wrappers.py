"""Serving wrappers for world-model and counterfactual-scorer networks.

Reference: reagent/prediction/predictor_wrapper.py —
Seq2RewardWithPreprocessor:643, Seq2RewardPlanShortSeqWithPreprocessor:687,
MDNRNNWithPreprocessor:828, CompressModelWithPreprocessor:869,
BinaryDifferenceScorerWithPreprocessor:176,
BinaryDifferenceScorerPredictorWrapper:216, LearnVMSlateWithPreprocessor:452.

Where the reference traces each wrapper into TorchScript, here each wrapper
closes over (module, params) and jits one pure forward; the action-sequence
enumeration that TorchScript couldn't trace becomes a compile-time constant
baked into the jitted graph.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt
from reagent_tpu.models.seq2reward_model import gen_permutations, get_Q
from reagent_tpu.preprocessing.preprocessor import Preprocessor

Array = jax.Array


class Seq2RewardWithPreprocessor:
    """Plan over ALL length-``seq_len`` action sequences; per first action,
    report the best achievable accumulated reward (reference :643-684)."""

    def __init__(
        self, model, params, state_preprocessor: Preprocessor,
        seq_len: int, num_action: int,
    ):
        self.model = model
        self.params = params
        self.state_preprocessor = state_preprocessor
        self.seq_len = seq_len
        self.num_action = num_action
        self.all_permut = gen_permutations(seq_len, num_action)
        self._fn = jax.jit(self._forward)

    def _forward(self, values: Array, presence: Array) -> Array:
        state = self.state_preprocessor(values, presence)
        return get_Q(self.model, self.params, state, self.all_permut)

    def __call__(self, values: Array, presence: Array) -> Array:
        return self._fn(values, presence)


class Seq2RewardPlanShortSeqWithPreprocessor:
    """Plan for every look-ahead in [1, seq_len], merge by the step model's
    predicted look-ahead distribution (reference :687-738)."""

    def __init__(
        self, model, params, step_model, step_params,
        state_preprocessor: Preprocessor, seq_len: int, num_action: int,
    ):
        self.model = model
        self.params = params
        self.step_model = step_model
        self.step_params = step_params
        self.state_preprocessor = state_preprocessor
        self.seq_len = seq_len
        self.num_action = num_action
        self.all_permut = [
            gen_permutations(s + 1, num_action) for s in range(seq_len)
        ]
        self._fn = jax.jit(self._forward)

    def _forward(self, values: Array, presence: Array) -> Array:
        state = self.state_preprocessor(values, presence)
        step_probability = jax.nn.softmax(
            self.step_model.apply(self.step_params, state), axis=1
        )  # [B, seq_len]
        max_acc_reward = jnp.stack(
            [
                get_Q(self.model, self.params, state, self.all_permut[i])
                for i in range(self.seq_len)
            ],
            axis=1,
        )  # [B, seq_len, A]
        return jnp.sum(max_acc_reward * step_probability[:, :, None], axis=1)

    def __call__(self, values: Array, presence: Array) -> Array:
        return self._fn(values, presence)


class CompressModelWithPreprocessor:
    """Compressed (distilled) world-model Q head behind the state
    preprocessor (reference :869-876)."""

    def __init__(self, model, params, state_preprocessor: Preprocessor):
        self.model = model
        self.params = params
        self.state_preprocessor = state_preprocessor
        self._fn = jax.jit(self._forward)

    def _forward(self, values: Array, presence: Array) -> Array:
        state = self.state_preprocessor(values, presence)
        return self.model.apply(self.params, state)

    def __call__(self, values: Array, presence: Array) -> Array:
        return self._fn(values, presence)


class MDNRNNWithPreprocessor:
    """Memory-network rollout behind the state preprocessor (reference
    :828-866).  Takes a flattened [B, seq_len*state_dim] state-with-presence
    and an action sequence [T, B, A]."""

    def __init__(
        self, model, params, state_preprocessor: Preprocessor,
        seq_len: int, num_action: int,
    ):
        self.model = model
        self.params = params
        self.state_preprocessor = state_preprocessor
        self.seq_len = seq_len
        self.num_action = num_action
        self._fn = jax.jit(self._forward)

    def _forward(self, values: Array, presence: Array, action: Array):
        B = values.shape[0]
        state = (
            self.state_preprocessor(values, presence)
            .reshape(B, self.seq_len, -1)
            .transpose(1, 0, 2)
        )
        return self.model.apply(
            self.params,
            rlt.FeatureData(float_features=state),
            rlt.FeatureData(float_features=action),
        )

    def __call__(self, values: Array, presence: Array, action: Array):
        return self._fn(values, presence, action)


class BinaryDifferenceScorerWithPreprocessor:
    """Two-logit model -> P(class 1) (reference :176-213)."""

    def __init__(self, model, params, state_preprocessor: Preprocessor):
        self.model = model
        self.params = params
        self.state_preprocessor = state_preprocessor
        self._fn = jax.jit(self._forward)

    def _forward(self, values: Array, presence: Array) -> Array:
        state = self.state_preprocessor(values, presence)
        logits = self.model.apply(self.params, state)
        assert logits.shape[1] == 2, f"{logits.shape}"
        return jax.nn.softmax(logits, axis=1)[:, 1]

    def __call__(self, values: Array, presence: Array) -> Array:
        return self._fn(values, presence)


class BinaryDifferenceScorerPredictorWrapper:
    """Serving facade over BinaryDifferenceScorerWithPreprocessor
    (reference :216-231)."""

    def __init__(self, scorer_with_preprocessor: BinaryDifferenceScorerWithPreprocessor):
        self.model = scorer_with_preprocessor

    def __call__(self, values: Array, presence: Array) -> Array:
        return self.model(values, presence)


class LearnVMSlateWithPreprocessor:
    """MLPScorer over (state, candidate slate) with per-side preprocessors
    (reference :452-492)."""

    def __init__(
        self, mlp, mlp_params,
        state_preprocessor: Preprocessor, candidate_preprocessor: Preprocessor,
    ):
        self.mlp = mlp
        self.mlp_params = mlp_params
        self.state_preprocessor = state_preprocessor
        self.candidate_preprocessor = candidate_preprocessor
        self._fn = jax.jit(self._forward)

    def _forward(
        self, state_vp: Tuple[Array, Array], candidate_vp: Tuple[Array, Array]
    ) -> Array:
        B, C, D = candidate_vp[0].shape
        state = self.state_preprocessor(*state_vp)
        cand = self.candidate_preprocessor(
            candidate_vp[0].reshape(B * C, D), candidate_vp[1].reshape(B * C, D)
        ).reshape(B, C, -1)
        feat = rlt.FeatureData(
            float_features=state, candidate_docs=rlt.DocList(float_features=cand)
        )
        return self.mlp.apply(self.mlp_params, feat).reshape(B, C)

    def __call__(self, state_vp, candidate_vp) -> Array:
        return self._fn(state_vp, candidate_vp)
