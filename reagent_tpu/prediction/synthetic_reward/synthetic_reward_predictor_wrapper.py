"""Synthetic-reward serving wrapper: (state|action, presence) window -> rewards.

Reference: reagent/prediction/synthetic_reward/synthetic_reward_predictor_wrapper.py
:13-75 — split the concatenated (state, action) value/presence columns, run
both preprocessors, and score a seq_len window with the reward net.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt
from reagent_tpu.preprocessing.preprocessor import Preprocessor

Array = jax.Array


def split_features(
    state_and_action_with_presence: Tuple[Array, Array],
    state_feat_num: int,
    action_feat_num: int,
):
    """Reference :13-27."""
    values, presence = state_and_action_with_presence
    sv = values[:, :state_feat_num]
    sp = presence[:, :state_feat_num]
    av = values[:, state_feat_num : state_feat_num + action_feat_num]
    ap = presence[:, state_feat_num : state_feat_num + action_feat_num]
    return (sv, sp), (av, ap)


class SyntheticRewardPredictorWrapper:
    def __init__(
        self,
        seq_len: int,
        state_preprocessor: Preprocessor,
        action_preprocessor: Preprocessor,
        net,
        net_params,
    ) -> None:
        self.seq_len = seq_len
        self.state_preprocessor = state_preprocessor
        self.action_preprocessor = action_preprocessor
        self.net = net
        self.net_params = net_params
        self.state_feat_num = len(state_preprocessor.sorted_features)
        self.action_feat_num = len(action_preprocessor.sorted_features)
        self._fn = jax.jit(self._forward)

    def _forward(self, values: Array, presence: Array) -> Array:
        (sv, sp), (av, ap) = split_features(
            (values, presence), self.state_feat_num, self.action_feat_num
        )
        # [seq_len, 1, dim] windows (batch of one trajectory; ref :56-64)
        state = self.state_preprocessor(sv, sp)[:, None, :]
        action = self.action_preprocessor(av, ap)[:, None, :]
        batch = rlt.MemoryNetworkInput(
            state=rlt.FeatureData(float_features=state),
            action=rlt.FeatureData(float_features=action),
            next_state=rlt.FeatureData(float_features=state),
            reward=jnp.zeros((self.seq_len, 1)),
            not_terminal=jnp.ones((self.seq_len, 1)),
            time_diff=None,
            step=None,
            valid_step=jnp.full((1, 1), self.seq_len, jnp.int32),
        )
        out = self.net.apply(self.net_params, batch)
        # per-step rewards for the window (ref returns the flattened window)
        return jnp.ravel(out.output)[-self.seq_len :]

    def __call__(self, state_and_action_with_presence: Tuple[Array, Array]) -> Array:
        values, presence = state_and_action_with_presence
        assert values.shape[0] == self.seq_len, (
            f"expected seq_len {self.seq_len}, got {values.shape[0]}"
        )
        return self._fn(values, presence)
