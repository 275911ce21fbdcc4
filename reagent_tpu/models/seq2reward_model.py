"""Seq2Reward: predict accumulated reward of an action sequence from a state.

Reference: reagent/models/seq2reward_model.py:14 — LSTM whose hidden state is
initialized from a linear map of the start state; inputs are pure actions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.core import types as rlt

Array = jax.Array


class Seq2RewardNetwork(nn.Module):
    state_dim: int
    action_dim: int
    num_hiddens: int
    num_hidden_layers: int

    @nn.compact
    def __call__(
        self,
        state: rlt.FeatureData,
        action: rlt.FeatureData,
        valid_reward_len: Optional[Array] = None,
    ) -> rlt.Seq2RewardOutput:
        """states [T, B, S], actions [T, B, A] -> acc_reward [B, 1]."""
        states = state.float_features
        actions = action.float_features
        B = states.shape[1]
        # hidden initialized from the first state; cell zero (ref :73-86)
        state_embed = nn.Dense(self.num_hiddens, name="map_linear")(states[0])
        xs = jnp.swapaxes(actions, 0, 1)  # [B, T, A]
        h = xs
        for i in range(self.num_hidden_layers):
            cell = nn.OptimizedLSTMCell(self.num_hiddens)
            carry = (jnp.zeros((B, self.num_hiddens)), state_embed)
            rnn = nn.RNN(cell, return_carry=False)
            h = rnn(h, initial_carry=carry)
        all_hidden = jnp.swapaxes(h, 0, 1)  # [T, B, H]
        if valid_reward_len is None:
            last_hidden = all_hidden[-1]
        else:
            idx = (valid_reward_len - 1).astype(jnp.int32)
            last_hidden = all_hidden[idx, jnp.arange(B)]
        acc_reward = nn.Dense(1, name="lstm_linear")(last_hidden)
        return rlt.Seq2RewardOutput(acc_reward=acc_reward)


def get_Q(
    seq2reward_network: Seq2RewardNetwork,
    params,
    cur_state: Array,
    all_permut: Array,
) -> Array:
    """Max accumulated reward over action sequences grouped by first action.

    Reference: training/world_model/seq2reward_trainer.py:32-66.
    cur_state [B, S]; all_permut [T, P, A] in lexical order.
    """
    batch_size = cur_state.shape[0]
    T, num_permut, num_action = all_permut.shape
    num_permut_per_action = num_permut // num_action

    # batch-major replication: row b*P+p pairs state b with permutation p
    preprocessed_state = jnp.broadcast_to(
        jnp.repeat(cur_state, num_permut, axis=0)[None],
        (T, batch_size * num_permut, cur_state.shape[1]),
    )
    action = jnp.tile(all_permut, (1, batch_size, 1))
    out = seq2reward_network.apply(
        params,
        rlt.FeatureData(float_features=preprocessed_state),
        rlt.FeatureData(float_features=action),
    )
    acc_reward = out.acc_reward.reshape(batch_size, num_action, num_permut_per_action)
    return jnp.max(acc_reward, axis=2)


def gen_permutations(seq_len: int, num_action: int) -> Array:
    """All action sequences of length seq_len, one-hot, lexical order: [T, A^T, A]."""
    import itertools

    import numpy as np

    perms = list(itertools.product(range(num_action), repeat=seq_len))
    arr = np.array(perms)  # [P, T]
    onehot = np.eye(num_action)[arr]  # [P, T, A]
    return jnp.asarray(onehot.transpose(1, 0, 2))  # [T, P, A]
